"""Native (C++/OpenMP) data-path: GIL-free .npy load + patchify + pad.

Builds ``packer.cpp`` into a shared library on first use (g++ is in the
image; no pybind11 — the interface is plain C via ctypes). Falls back to
None when no compiler is available; callers keep the pure-numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "pack_batch_native", "pack_batch_gather_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packer.cpp")
_SO = os.path.join(_DIR, "libfitpacker.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native packer; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.pack_batch.restype = ctypes.c_int
        lib.pack_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.POINTER(ctypes.c_int),  # flips
            ctypes.c_int,  # n
            ctypes.c_int,  # patch
            ctypes.c_int,  # max_len
            ctypes.c_int,  # dtok
            ctypes.POINTER(ctypes.c_float),  # out_tokens
            ctypes.POINTER(ctypes.c_ubyte),  # out_mask
            ctypes.POINTER(ctypes.c_int),  # out_hw
            ctypes.POINTER(ctypes.c_int),  # lengths
        ]
        lib.pack_batch_gather.restype = ctypes.c_int
        lib.pack_batch_gather.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.POINTER(ctypes.c_int),  # flips
            ctypes.POINTER(ctypes.c_int),  # gather (n, n_out)
            ctypes.c_int,  # n
            ctypes.c_int,  # n_out
            ctypes.c_int,  # patch
            ctypes.c_int,  # dtok
            ctypes.POINTER(ctypes.c_float),  # out_tokens
            ctypes.POINTER(ctypes.c_ubyte),  # out_mask
            ctypes.POINTER(ctypes.c_int),  # out_hw
            ctypes.POINTER(ctypes.c_int),  # lengths
        ]
        _lib = lib
        return _lib


def pack_batch_native(
    paths, flips: np.ndarray, patch: int, max_len: int, dtok: int
):
    """Pack ``paths`` -> (tokens (B,T,D) f32, mask (B,T) bool, hw (B,2) i32,
    lengths (B,) i32) using the native library; raises if unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native packer unavailable (no compiler?)")
    n = len(paths)
    tokens = np.zeros((n, max_len, dtok), np.float32)
    mask = np.zeros((n, max_len), np.uint8)
    hw = np.zeros((n, 2), np.int32)
    lengths = np.zeros((n,), np.int32)
    flips = np.ascontiguousarray(flips, dtype=np.int32)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    err = lib.pack_batch(
        c_paths,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, patch, max_len, dtok,
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if err != 0:
        bad = -err - 1
        raise IOError(f"native packer failed on {paths[bad]} (code {lengths[bad]})")
    return tokens, mask.astype(bool), hw, lengths


def pack_batch_gather_native(
    paths, flips: np.ndarray, gather: np.ndarray, patch: int, dtok: int
):
    """Bucket-mode packing: per-sample row GATHER instead of identity-pad.
    ``gather`` (B, n) int32 maps each output row to a source token index, -1
    = zero pad row (mask False). The caller draws the subsample permutations
    (masked_FiT ``iterators.py:142-152`` semantics) so the rng stream stays
    bit-identical to the pure-numpy path; C++ only does IO/convert/flip/
    patchify/gather, GIL-free over OpenMP threads."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native packer unavailable (no compiler?)")
    n, n_out = gather.shape
    assert n == len(paths)
    tokens = np.zeros((n, n_out, dtok), np.float32)
    mask = np.zeros((n, n_out), np.uint8)
    hw = np.zeros((n, 2), np.int32)
    lengths = np.zeros((n,), np.int32)
    flips = np.ascontiguousarray(flips, dtype=np.int32)
    gather = np.ascontiguousarray(gather, dtype=np.int32)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    err = lib.pack_batch_gather(
        c_paths,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        gather.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, n_out, patch, dtok,
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if err != 0:
        bad = -err - 1
        raise IOError(f"native packer failed on {paths[bad]} (code {lengths[bad]})")
    return tokens, mask.astype(bool), hw, lengths
