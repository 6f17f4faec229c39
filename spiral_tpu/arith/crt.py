"""CRT residue <-> 56-bit lift conversions.

Coefficient-domain polynomials are stored as residue pairs (x mod p_i,
x mod b_i); the full Q-value is materialised only transiently (as a u32
pair) for gadget digit extraction and rescaling.  This replaces the
reference's crt_compose / cpu_crt (ref: src/poly.cpp:344-353,
src/spiral.cpp:586-609) which keeps coefficients as single u64 words.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..params import B_I, P_I, Q
from .mod import mod_ctx
from .u32 import add_pair_u32, mul32_wide

# Garner constant: p^{-1} mod b (+ Shoup companion for the lane multiply)
P_INV_MOD_B = pow(P_I, B_I - 2, B_I)
P_INV_MOD_B_SHOUP = (P_INV_MOD_B << 32) // B_I


def lift_pair(x, y):
    """Residues (x mod p, y mod b) -> value mod Q as a u32 pair (hi, lo).

    Garner: v = x + p * ((y - x) * p^{-1} mod b), v < Q < 2^56.
    x is canonical (< p < 2b), so one conditional subtract replaces the
    generic reduce, and the constant multiply runs Shoup-form — this is
    the hot prologue of every gadget decomposition (fold/expand kernels).
    """
    mb = mod_ctx(B_I)
    bb = jnp.uint32(B_I)
    x_mod_b = jnp.where(x >= bb, x - bb, x)
    t = mb.mul_shoup(mb.sub(y, x_mod_b), jnp.uint32(P_INV_MOD_B),
                     jnp.uint32(P_INV_MOD_B_SHOUP))
    hi, lo = mul32_wide(jnp.uint32(P_I), t)
    return add_pair_u32(hi, lo, x)


def residues_from_pair(hi, lo):
    """u32 pair (value < 2^56) -> residues (mod p, mod b)."""
    mp_, mb = mod_ctx(P_I), mod_ctx(B_I)
    return mp_.reduce_pair(hi, lo), mb.reduce_pair(hi, lo)


@lru_cache(maxsize=None)
def _int_residues(v: int) -> tuple[int, int]:
    return v % P_I, v % B_I


def const_residues(v: int):
    """Host: python int (mod Q) -> (x, y) residue ints."""
    return _int_residues(v % Q)


def residues_to_int(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Host numpy: residue arrays -> python-int object array of values mod Q."""
    xo = x.astype(object)
    yo = y.astype(object)
    t = ((yo - xo) * P_INV_MOD_B) % B_I
    return xo + P_I * t


def int_to_residues(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host numpy: int/object array of values (any sign) -> residue u32 arrays."""
    vo = np.asarray(v, dtype=object)
    return (
        (vo % P_I).astype(np.uint32),
        (vo % B_I).astype(np.uint32),
    )
