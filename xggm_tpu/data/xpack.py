"""XPack: packed binary feature cache + native batch loader bindings.

The TPU-native ingest path (SURVEY.md §2.9): a one-time converter lays each
image's fixed-shape record (feats [36,F] f32 | boxes01 [36,4] f32 |
adj [36,36] f32) out contiguously in a single binary file with a JSON index,
and the C++ library (csrc/xpack_loader.cpp, mmap + thread-pool gather +
async prefetch) assembles batches without per-item H5 reads. Falls back to a
pure-numpy mmap gather when the native library isn't built.

Build the native library with `make -C csrc` (done automatically by
`ensure_native()` when a compiler is available).
"""
from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from xggm_tpu.config import NUM_OBJECTS

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "csrc", "libxpack.so")

_lib = None


def ensure_native(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and build:
        try:
            subprocess.run(["make", "-C", os.path.dirname(_SO_PATH)],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.xp_open.restype = ctypes.c_void_p
    lib.xp_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    lib.xp_close.argtypes = [ctypes.c_void_p]
    lib.xp_gather.restype = ctypes.c_int
    lib.xp_gather.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.c_int64, ctypes.c_void_p]
    lib.xp_submit.restype = ctypes.c_void_p
    lib.xp_submit.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.c_int64, ctypes.c_void_p]
    lib.xp_wait.restype = ctypes.c_int
    lib.xp_wait.argtypes = [ctypes.c_void_p]
    lib.xp_n_items.restype = ctypes.c_int64
    lib.xp_n_items.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def record_spec(feat_dim: int) -> List[Tuple[str, Tuple[int, ...]]]:
    return [("feats", (NUM_OBJECTS, feat_dim)),
            ("boxes", (NUM_OBJECTS, 4)),
            ("adj", (NUM_OBJECTS, NUM_OBJECTS))]


def record_floats(feat_dim: int) -> int:
    return sum(int(np.prod(shape)) for _, shape in record_spec(feat_dim))


def convert_h5_to_xpack(obj_h5: str, info_json: str, adj_h5: Optional[str],
                        out_path: str, feat_dim: int = 2048) -> str:
    """One-time H5 -> xpack conversion. Boxes are pre-normalized to [0,1]
    here (hoisting the per-__getitem__ work out of the hot loop)."""
    import h5py

    from xggm_tpu.utils.io import load_json, save_json

    info = {d["img_id"]: d for d in load_json(info_json)}
    obj = h5py.File(obj_h5, "r")
    adj = h5py.File(adj_h5, "r") if adj_h5 else None

    img_ids = [i for i in obj.keys() if i in info]
    n_floats = record_floats(feat_dim)
    with open(out_path, "wb") as f:
        for img_id in img_ids:
            g = obj[img_id]
            meta = info[img_id]
            feats = np.asarray(g["features"], np.float32)
            boxes = np.asarray(g["boxes"], np.float32).copy()
            boxes[:, (0, 2)] /= meta["img_w"]
            boxes[:, (1, 3)] /= meta["img_h"]
            a = (np.asarray(adj[img_id], np.float32) if adj is not None
                 else np.zeros((NUM_OBJECTS, NUM_OBJECTS), np.float32))
            rec = np.concatenate([feats.ravel(), boxes.ravel(), a.ravel()])
            assert rec.size == n_floats, (rec.size, n_floats)
            f.write(rec.astype(np.float32).tobytes())
    save_json({"img_ids": img_ids, "feat_dim": feat_dim},
              out_path + ".index.json")
    obj.close()
    if adj is not None:
        adj.close()
    return out_path


class XPack:
    """Batch reader over a pack file; native when possible."""

    def __init__(self, path: str):
        with open(path + ".index.json") as f:
            index = json.load(f)
        self.img_ids: List[str] = index["img_ids"]
        self.feat_dim: int = index["feat_dim"]
        self.id2row = {i: r for r, i in enumerate(self.img_ids)}
        self.n_floats = record_floats(self.feat_dim)
        self.item_bytes = self.n_floats * 4

        self._lib = ensure_native()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.xp_open(
                path.encode(), len(self.img_ids), self.item_bytes)
            if not self._handle:
                self._lib = None
        if self._handle is None:
            self._mm = np.memmap(path, dtype=np.float32, mode="r",
                                 shape=(len(self.img_ids), self.n_floats))

    @property
    def native(self) -> bool:
        return self._handle is not None

    def gather_rows(self, rows: Sequence[int]) -> np.ndarray:
        """[n, n_floats] float32 batch of raw records."""
        idx = np.ascontiguousarray(rows, dtype=np.int64)
        n = len(idx)
        if self._handle is not None:
            out = np.empty((n, self.n_floats), np.float32)
            rc = self._lib.xp_gather(
                self._handle, idx.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)),
                n, out.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise RuntimeError(f"xp_gather failed: {rc}")
            return out
        return np.asarray(self._mm[idx])

    def submit(self, rows: Sequence[int]) -> Tuple[object, np.ndarray]:
        """Start an async gather; returns (job, out_buffer). Use wait(job)."""
        idx = np.ascontiguousarray(rows, dtype=np.int64)
        out = np.empty((len(idx), self.n_floats), np.float32)
        if self._handle is None:
            out[:] = self._mm[idx]
            return None, out
        job = self._lib.xp_submit(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), out.ctypes.data_as(ctypes.c_void_p))
        # keep idx alive until wait
        return (job, idx), out

    def wait(self, job) -> None:
        if job is None:
            return
        self._lib.xp_wait(job[0])

    def unpack(self, raw: np.ndarray) -> Dict[str, np.ndarray]:
        """[n, n_floats] -> dict of feats/boxes/adj batch arrays."""
        n = raw.shape[0]
        out = {}
        off = 0
        for name, shape in record_spec(self.feat_dim):
            size = int(np.prod(shape))
            out[name] = raw[:, off:off + size].reshape((n,) + shape)
            off += size
        return out

    def close(self):
        if self._handle is not None:
            self._lib.xp_close(self._handle)
            self._handle = None


class XPackFeatureStore:
    """Drop-in for H5FeatureStore backed by a pack file (batch-oriented)."""

    def __init__(self, pack_path: str):
        self.pack = XPack(pack_path)

    def has(self, img_id: str) -> bool:
        return img_id in self.pack.id2row

    def img_ids(self) -> List[str]:
        return list(self.pack.img_ids)

    def get(self, img_id: str):
        raw = self.pack.gather_rows([self.pack.id2row[img_id]])
        rec = self.pack.unpack(raw)
        return rec["feats"][0], rec["boxes"][0], rec["adj"][0]

    def get_batch(self, img_ids: Sequence[str]) -> Dict[str, np.ndarray]:
        rows = [self.pack.id2row[i] for i in img_ids]
        return self.pack.unpack(self.pack.gather_rows(rows))
