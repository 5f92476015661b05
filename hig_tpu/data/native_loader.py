"""ctypes bindings for the native C++ batch loader (native/loader.cpp).

Drop-in fast path for the training input pipeline: clips live in a C++
store; batches (windowed + normalized + role-swapped, fixed shape) are
filled by multithreaded native code. Falls back transparently — callers
check :func:`available` and use the Python pipeline otherwise. Window-shift
randomness uses a native counter RNG (deterministic per (seed, epoch,
clip)), so batches are reproducible but not bitwise identical to the Python
path's numpy streams.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libhig_loader.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.hig_store_create.restype = ctypes.c_void_p
    lib.hig_store_create.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.hig_store_destroy.argtypes = [ctypes.c_void_p]
    lib.hig_store_add_clip.restype = ctypes.c_int64
    lib.hig_store_add_clip.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.hig_store_size.restype = ctypes.c_int64
    lib.hig_store_size.argtypes = [ctypes.c_void_p]
    lib.hig_sample_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeClipStore:
    """Owns the C++ store; mirrors the clips of a PairDataset."""

    def __init__(self, mean: np.ndarray, std: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed?)")
        self._lib = lib
        assert mean.shape == std.shape and mean.ndim == 1
        self.D = int(mean.shape[0] - 4)
        mean32 = np.ascontiguousarray(mean, np.float32)
        std32 = np.ascontiguousarray(std, np.float32)
        self._handle = ctypes.c_void_p(
            lib.hig_store_create(_fptr(mean32), _fptr(std32), self.D)
        )

    def add_clip(self, motion: np.ndarray) -> int:
        assert motion.ndim == 3 and motion.shape[0] == 2 and motion.shape[2] == self.D
        m = np.ascontiguousarray(motion, np.float32)
        return int(
            self._lib.hig_store_add_clip(
                self._handle, _fptr(m), m.shape[1], m.shape[2]
            )
        )

    def __len__(self) -> int:
        return int(self._lib.hig_store_size(self._handle))

    def sample_batch(
        self,
        clip_indices: np.ndarray,
        window: int = 90,
        seed: int = 0,
        epoch: int = 0,
        swap_flags: np.ndarray | None = None,
        num_threads: int = 0,
    ):
        """→ (motion (B, 2, window+1, D) f32, lengths (B,) i32)."""
        B = len(clip_indices)
        idx = np.ascontiguousarray(clip_indices, np.int64)
        out = np.empty((B, 2, window + 1, self.D), np.float32)
        lengths = np.empty((B,), np.int32)
        if swap_flags is not None:
            swap_flags = np.ascontiguousarray(swap_flags, np.uint8)
            swap_ptr = swap_flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        else:
            swap_ptr = None
        num_threads = num_threads or min(8, os.cpu_count() or 1)
        self._lib.hig_sample_batch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            swap_ptr,
            B,
            window,
            seed,
            epoch,
            _fptr(out),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_threads,
        )
        return out, lengths

    def __del__(self):
        try:
            self._lib.hig_store_destroy(self._handle)
        except Exception:
            pass


def store_from_dataset(dataset) -> tuple["NativeClipStore", np.ndarray]:
    """Build a native store from a PairDataset; returns (store, swap_flags)
    where swap_flags encodes the dataset's pseudo-label role swaps."""
    mean, std = dataset.mean, dataset.std
    store = NativeClipStore(np.asarray(mean), np.asarray(std))
    swaps = np.zeros(len(dataset.clips), np.uint8)
    for i, clip in enumerate(dataset.clips):
        store.add_clip(clip.motion)
        if dataset.labels is not None and dataset.labels.get(clip.name, 0) == 1:
            swaps[i] = 1
    return store, swaps
