"""ctypes bindings for the native host data plane (native/hostplane.cpp).

Optional fast path: when ``native/libhostplane.so`` is built (``make -C
native``), batch assembly (int16 decode + pad/crop + gain + roll),
wave-mixup and packbits-target unpacking run in multithreaded C++; the
pure-numpy implementations in ``passt_tpu.data.datasets`` remain the
fallback and the behavioral reference.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "libhostplane.so")


def load(n_threads: Optional[int] = None) -> Optional[ctypes.CDLL]:
    """Load (and memoize) the native library; None if not built."""
    global _LIB, _SEARCHED
    if _LIB is not None or _SEARCHED:
        return _LIB
    _SEARCHED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.hostplane_init.argtypes = [ctypes.c_int]
    lib.hostplane_version.restype = ctypes.c_int
    lib.hostplane_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    lib.hostplane_wavmix.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.hostplane_unpack_targets.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    if n_threads is None:
        n_threads = max(0, (os.cpu_count() or 1) - 1)
    lib.hostplane_init(n_threads)
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def assemble_batch(
    pcm_items,
    clip_samples: int,
    gain_db: int = 0,
    roll_range: int = 0,
    random_crop: bool = False,
    seed: int = 0,
) -> np.ndarray:
    """pcm_items: list of int16 arrays -> [B, clip_samples] float32 with
    fused decode/pad-or-crop/gain/roll (deterministic in (seed, index))."""
    lib = load()
    assert lib is not None, "libhostplane.so not built (make -C native)"
    b = len(pcm_items)
    items = [np.ascontiguousarray(x, dtype=np.int16) for x in pcm_items]
    ptrs = (ctypes.c_void_p * b)(
        *[x.ctypes.data_as(ctypes.c_void_p).value for x in items]
    )
    lens = (ctypes.c_int64 * b)(*[len(x) for x in items])
    out = np.empty((b, clip_samples), dtype=np.float32)
    lib.hostplane_assemble_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(lens, ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b,
        clip_samples,
        gain_db,
        roll_range,
        1 if random_crop else 0,
        seed,
    )
    return out


def wavmix(out: np.ndarray, other: np.ndarray, lam: np.ndarray, apply: np.ndarray) -> None:
    """In-place wave mixup on a [B, T] batch (see hostplane_wavmix)."""
    lib = load()
    assert lib is not None
    b, t = out.shape
    lib.hostplane_wavmix(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(other, np.float32).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(lam, np.float32).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(apply, np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b,
        t,
    )


def unpack_targets(packed: np.ndarray, classes: int) -> np.ndarray:
    lib = load()
    assert lib is not None
    packed = np.ascontiguousarray(packed, np.uint8)
    b, w = packed.shape
    out = np.empty((b, classes), dtype=np.float32)
    lib.hostplane_unpack_targets(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b,
        w,
        classes,
    )
    return out
