"""ctypes binding for the native host runtime (native/spiral_native.cpp).

Builds the shared library with g++ on first use and caches it next to the
source; every entry point has a pure-python fallback so the framework
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = pathlib.Path(__file__).resolve().parent.parent / "native" / \
        "spiral_native.cpp"
    so = src.with_suffix(".so")
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(src), "-o", str(so)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.center_lift.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.crt_lift.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64,
            ctypes.c_void_p]
        lib.rescale_vals.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_void_p]
        lib.bit_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p]
        lib.bit_unpack.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def center_lift(pts: np.ndarray, p_db: int, mod_p: int, mod_b: int):
    """int16 array -> (limb_p, limb_b) u32 arrays (centered lift)."""
    lib = _build_and_load()
    flat = np.ascontiguousarray(pts, dtype=np.int16)
    if lib is None:
        c = np.where(flat >= p_db // 2, flat.astype(np.int64) - p_db,
                     flat.astype(np.int64))
        return (np.where(c < 0, c + mod_p, c).astype(np.uint32),
                np.where(c < 0, c + mod_b, c).astype(np.uint32))
    lp = np.empty(flat.shape, dtype=np.uint32)
    lb = np.empty(flat.shape, dtype=np.uint32)
    lib.center_lift(flat.ctypes.data, flat.size, p_db, mod_p, mod_b,
                    lp.ctypes.data, lb.ctypes.data)
    return lp, lb


def crt_lift_u64(xs: np.ndarray, ys: np.ndarray, mod_p: int, mod_b: int,
                 p_inv_mod_b: int) -> np.ndarray:
    """Residue pairs -> u64 values mod Q (Q < 2^63)."""
    lib = _build_and_load()
    xs = np.ascontiguousarray(xs, dtype=np.uint32)
    ys = np.ascontiguousarray(ys, dtype=np.uint32)
    if lib is None:
        xo, yo = xs.astype(object), ys.astype(object)
        t = ((yo - xo) * p_inv_mod_b) % mod_b
        return (xo + mod_p * t).astype(np.uint64)
    out = np.empty(xs.shape, dtype=np.uint64)
    lib.crt_lift(xs.ctypes.data, ys.ctypes.data, xs.size, mod_p, mod_b,
                 p_inv_mod_b, out.ctypes.data)
    return out


def rescale_u64(vals: np.ndarray, in_mod: int, out_mod: int) -> np.ndarray:
    """Centered rounded rescale (exact, matches core/rescale.py)."""
    lib = _build_and_load()
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if lib is None:
        from .core.rescale import rescale_array
        return rescale_array(vals.astype(object), in_mod,
                             out_mod).astype(np.uint64)
    out = np.empty(vals.shape, dtype=np.uint64)
    lib.rescale_vals(vals.ctypes.data, vals.size, in_mod, out_mod,
                     out.ctypes.data)
    return out


def bit_pack(vals: np.ndarray, width: int) -> bytes:
    lib = _build_and_load()
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    nbytes = (vals.size * width + 7) // 8
    if lib is None:
        from .core.rescale import pack_bits
        return pack_bits(vals.astype(object), width)
    buf = np.zeros(nbytes + 16, dtype=np.uint8)
    lib.bit_pack(vals.ctypes.data, vals.size, width, buf.ctypes.data)
    return bytes(buf[:nbytes])


def bit_unpack(data: bytes, width: int, count: int) -> np.ndarray:
    lib = _build_and_load()
    if lib is None:
        from .core.rescale import unpack_bits
        return unpack_bits(data, width, count).astype(np.uint64)
    buf = np.frombuffer(data + b"\0" * 16, dtype=np.uint8)
    out = np.empty(count, dtype=np.uint64)
    lib.bit_unpack(buf.ctypes.data, count, width, out.ctypes.data)
    return out
