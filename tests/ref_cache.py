"""Disk cache for deterministic torch-reference products.

The trajectory-parity tests drive the REAL reference training loop (torch on
CPU) to produce loss sequences and recorded noise draws. Those products are
fully deterministic (seeded model build, fixed numpy data, seeded dropout),
so re-deriving them on every suite run only burns time - the full-depth
9/5/5 x 768 trajectories dominate the suite's runtime.

This cache stores each product on disk keyed by a sha256 of:
  - the torch version,
  - the SOURCE of every file the derivation flows through (the calling test
    module, tools/make_goldens.py), and
  - the repr of the parameter dict (depth, steps, branch plan, lr, ...).

Any edit to the test harness or its parameters invalidates the entry and the
reference is re-run live - the cross-check stays "live" in the sense that
matters (nothing hand-written is ever pinned; `rm -rf tests/.ref_cache` at
any time forces a from-scratch reproduction).
"""
import hashlib
import os
import pickle

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".ref_cache")


def cached(name, params, builder, depends_on=()):
    """Return builder()'s (pickled) result, memoized on disk.

    params: dict of hashable values identifying the derivation.
    depends_on: source files whose content participates in the key.
    """
    h = hashlib.sha256()
    import torch
    h.update(torch.__version__.encode())
    for f in depends_on:
        with open(f, "rb") as fh:
            h.update(fh.read())
    h.update(repr(sorted(params.items())).encode())
    path = os.path.join(CACHE_DIR, f"{name}-{h.hexdigest()[:20]}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as fh:
            return pickle.load(fh)
    result = builder()
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        pickle.dump(result, fh, protocol=4)
    os.replace(tmp, path)
    return result
