"""File I/O helpers (reference src/utils.py:21-143 equivalents)."""
from __future__ import annotations

import json
import pickle
from typing import Any, Dict, List


def load_json(path: str) -> Any:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def save_json(obj: Any, path: str, indent: int = 4, sort_keys: bool = False) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=indent, sort_keys=sort_keys)


def load_pickle(path: str) -> Any:
    """Pickle load with latin-1 retry (reference src/utils.py:117-127)."""
    with open(path, "rb") as f:
        try:
            return pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            return pickle.load(f, encoding="latin-1")


def save_pickle(obj: Any, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_txt_lines(path: str) -> List[str]:
    with open(path, "r", encoding="utf-8") as f:
        return [ln.rstrip("\n") for ln in f]


def load_obj_h5(path: str) -> Dict[str, Any]:
    """Open an obj36 H5 file (reference src/utils.py:65-98 reads per-image
    groups with boxes/features datasets); returns the h5py File handle."""
    import h5py

    return h5py.File(path, "r")
