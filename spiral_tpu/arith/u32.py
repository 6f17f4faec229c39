"""32-bit lane integer primitives.

Every Spiral-TPU kernel is built from uint32 lane arithmetic so identical
code runs under XLA:CPU, XLA:TPU and Pallas/Mosaic (which has no 64-bit
integer support).  These helpers play the role of the reference's
__uint128_t / umul64wide utilities (ref: include/core.h:55-65,
src/poly.cpp:5-32) re-expressed as u32 pairs.

A "pair" (hi, lo) represents the 64-bit value hi * 2^32 + lo.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
# numpy scalar: a jnp constant here would initialize the device backend at
# import time (and race the remote-TPU plugin registration)
MASK16 = np.uint32(0xFFFF)


def u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


def mul32_wide(a, b):
    """Full 64-bit product of two u32 arrays, returned as a (hi, lo) pair."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    hi = a1 * b1
    t = (lo >> 16) + (m1 & MASK16) + (m2 & MASK16)
    hi_out = hi + (m1 >> 16) + (m2 >> 16) + (t >> 16)
    lo_out = (t << 16) | (lo & MASK16)
    return hi_out, lo_out


def umulhi32(a, b):
    hi, _ = mul32_wide(a, b)
    return hi


def add_pair(hi1, lo1, hi2, lo2):
    """(hi1,lo1) + (hi2,lo2) mod 2^64 as a pair."""
    lo = lo1 + lo2
    carry = (lo < lo1).astype(jnp.uint32)
    return hi1 + hi2 + carry, lo


def add_pair_u32(hi, lo, v):
    lo2 = lo + v
    carry = (lo2 < lo).astype(jnp.uint32)
    return hi + carry, lo2


def sub_pair(hi1, lo1, hi2, lo2):
    """(hi1,lo1) - (hi2,lo2) mod 2^64 as a pair (caller ensures >= 0)."""
    lo = lo1 - lo2
    borrow = (lo1 < lo2).astype(jnp.uint32)
    return hi1 - hi2 - borrow, lo


def shr_pair(hi, lo, s: int):
    """(hi,lo) >> s for static 0 <= s < 64, result as pair."""
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    if s == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (s - 32)


def pair_geq(hi1, lo1, hi2, lo2):
    return (hi1 > hi2) | ((hi1 == hi2) & (lo1 >= lo2))


def pair_to_int(hi, lo) -> int:
    """Host helper: collapse a concrete scalar pair to a python int."""
    return (int(hi) << 32) | int(lo)
