"""Modular arithmetic contexts over u32 lanes.

Replaces the reference's Barrett helpers (ref: include/poly.h:137-153,
src/poly.cpp:11-32) with u32-pair Barrett reductions that never touch a
64-bit integer type, so they run under Pallas/Mosaic as well as XLA.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .u32 import mul32_wide, umulhi32


@dataclasses.dataclass(frozen=True)
class ModContext:
    """Precomputed reduction constants for a fixed modulus p < 2^31."""

    p: int

    @property
    def k(self) -> int:
        return self.p.bit_length()

    # floor(2^64 / p) split into two u32 words (SEAL-style const ratio)
    @property
    def _ratio64(self) -> tuple[int, int]:
        f = (1 << 64) // self.p
        return f >> 32, f & 0xFFFFFFFF

    # Barrett constant for reducing full 64-bit products: mu = floor(2^S / p).
    # Valid for inputs < 2^S; S is the largest bound keeping mu and the
    # quotient inside u32.  For the CRT pair (k=28) this gives S=56, covering
    # all 56-bit lifted values.
    @property
    def _pair_S(self) -> int:
        return max(56, 2 * self.k) if self.k >= 25 else 2 * self.k

    @property
    def _pair_mu(self) -> int:
        return (1 << self._pair_S) // self.p

    # ---- elementwise ops on u32 arrays, canonical range [0, p) -------------

    def add(self, a, b):
        p = jnp.uint32(self.p)
        s = a + b
        return jnp.where(s >= p, s - p, s)

    def sub(self, a, b):
        p = jnp.uint32(self.p)
        s = a + p - b
        return jnp.where(s >= p, s - p, s)

    def neg(self, a):
        p = jnp.uint32(self.p)
        s = p - a
        return jnp.where(s >= p, s - p, s)

    # Solinas fast reduction: for p = 2^28 - c, any u32 v = hi*2^28 + lo
    # folds as lo + hi*c; one or two folds reach the one-subtract range
    # for both CRT moduli — ~5-9 VPU ops instead of the ~25 of the generic
    # two-word Barrett.  This is the u32-lane analog of the reference
    # exploiting its NTT-friendly moduli (values.h:13,21).
    @property
    def _solinas(self) -> tuple[int, int] | None:
        """(c, folds) or None."""
        if self.k != 28:
            return None
        c = (1 << 28) - self.p
        bound = (1 << 28) + 16 * c
        if bound < 2 * self.p:
            return c, 1
        if (1 << 28) + (bound >> 28) * c < 2 * self.p:
            return c, 2
        return None

    def reduce_u32(self, v):
        """v mod p for any u32 v."""
        p = jnp.uint32(self.p)
        sol = self._solinas
        if sol is not None:
            c, folds = sol
            mask = jnp.uint32((1 << 28) - 1)
            s = (v & mask) + (v >> 28) * jnp.uint32(c)
            if folds == 2:
                s = (s & mask) + (s >> 28) * jnp.uint32(c)
            return jnp.where(s >= p, s - p, s)
        r1, r0 = self._ratio64
        z = umulhi32(v, jnp.uint32(r0))
        h1, l1 = mul32_wide(v, jnp.uint32(r1))
        s = l1 + z
        q = h1 + (s < l1).astype(jnp.uint32)
        r = v - q * p
        r = jnp.where(r >= p, r - p, r)
        r = jnp.where(r >= p, r - p, r)
        return r

    def reduce_pair(self, hi, lo):
        """(hi*2^32 + lo) mod p, input < 2^S (S=56 for 28-bit moduli)."""
        S = self._pair_S
        mu = jnp.uint32(self._pair_mu)
        assert self._pair_mu < (1 << 32)
        t2h, t2l = mul32_wide(hi, mu)
        t1h, t1l = mul32_wide(lo, mu)
        s = t2l + t1h
        c = (s < t1h).astype(jnp.uint32)
        w = S - 32
        q = (t2h << (32 - w)) + (c << (32 - w)) + (s >> w)
        p = jnp.uint32(self.p)
        r = lo - q * p
        r = jnp.where(r >= p, r - p, r)
        r = jnp.where(r >= p, r - p, r)
        return r

    def mul(self, a, b):
        """(a*b) mod p for a, b in [0, p)."""
        if 2 * self.k <= 32:
            return self.reduce_u32(a * b)
        hi, lo = mul32_wide(a, b)
        return self.reduce_pair(hi, lo)

    def mul_shoup(self, y, w, w_shoup):
        """y*w mod p with w a constant and w_shoup = floor(w*2^32/p)."""
        q = umulhi32(y, w_shoup)
        p = jnp.uint32(self.p)
        r = w * y - q * p
        return jnp.where(r >= p, r - p, r)

    # ---- host-side helpers --------------------------------------------------

    def shoup(self, w) -> np.ndarray:
        """floor(w * 2^32 / p) for a host numpy array of constants."""
        w = np.asarray(w, dtype=np.uint64)
        return ((w << np.uint64(32)) // np.uint64(self.p)).astype(np.uint32)

    def pow_host(self, base: int, e: int) -> int:
        return pow(base, e, self.p)

    def inv_host(self, a: int) -> int:
        return pow(a, self.p - 2, self.p)


@lru_cache(maxsize=None)
def mod_ctx(p: int) -> ModContext:
    # p < 2^30 keeps 3p (Barrett pre-correction range) inside u32.
    assert 2 <= p < (1 << 30)
    return ModContext(p)
