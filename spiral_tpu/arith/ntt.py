"""Batched negacyclic NTT over u32 lanes.

TPU-native counterpart of the reference's hand-written Harvey-butterfly
NTT (ref: src/core.cpp:247-514).  Instead of in-place strided butterflies,
each stage is a reshape + elementwise butterfly over a trailing split axis
(Stockham-style, no bit-reversal permutations, no gathers), which XLA maps
onto the VPU for an arbitrary leading batch.  The negacyclic wrap is
handled by a psi^i twist so all stages are plain cyclic radix-2.

All values stay canonical in [0, p); constant multiplies use Shoup
precomputation (same trick as ref: src/core.cpp:287-289).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import B_I, P_I
from .mod import mod_ctx
from .tables import NttTables, ntt_tables


def ntt_forward(x, tb: NttTables):
    """Negacyclic forward NTT over the last axis. x: u32 (..., d) in [0, p)."""
    ctx = mod_ctx(tb.p)
    d = tb.d
    L = d.bit_length() - 1
    x = ctx.mul_shoup(x, tb.twist, tb.twist_shoup)
    for s in range(L):
        t = d >> (s + 1)
        v = x.reshape(x.shape[:-1] + (1 << s, 2, t))
        l = v[..., 0, :]
        r = v[..., 1, :]
        nl = ctx.add(l, r)
        nr = ctx.mul_shoup(ctx.sub(l, r), tb.fwd_tw[s], tb.fwd_tw_shoup[s])
        x = jnp.stack([nl, nr], axis=-2).reshape(x.shape)
    return x


def ntt_inverse(x, tb: NttTables):
    """Inverse of ntt_forward (exact, canonical output in [0, p))."""
    ctx = mod_ctx(tb.p)
    d = tb.d
    L = d.bit_length() - 1
    for s in range(L - 1, -1, -1):
        t = d >> (s + 1)
        v = x.reshape(x.shape[:-1] + (1 << s, 2, t))
        a = v[..., 0, :]
        b = v[..., 1, :]
        bw = ctx.mul_shoup(b, tb.inv_tw[s], tb.inv_tw_shoup[s])
        nl = ctx.add(a, bw)
        nr = ctx.sub(a, bw)
        x = jnp.stack([nl, nr], axis=-2).reshape(x.shape)
    return ctx.mul_shoup(x, tb.untwist, tb.untwist_shoup)


class CrtNtt:
    """Both CRT limbs: transforms arrays shaped (..., 2, d).

    forward/inverse are jitted once per input shape; the tables are closed
    over so eager call sites pay a single compile instead of one per stage.
    """

    def __init__(self, d: int):
        self.d = d
        self.tb_p = ntt_tables(P_I, d)
        self.tb_b = ntt_tables(B_I, d)
        self.forward = jax.jit(self._forward)
        self.inverse = jax.jit(self._inverse)

    def _forward(self, x):
        return jnp.stack(
            [ntt_forward(x[..., 0, :], self.tb_p),
             ntt_forward(x[..., 1, :], self.tb_b)], axis=-2)

    def _inverse(self, x):
        return jnp.stack(
            [ntt_inverse(x[..., 0, :], self.tb_p),
             ntt_inverse(x[..., 1, :], self.tb_b)], axis=-2)


_crt_ntt_cache: dict[int, object] = {}


def crt_ntt(d: int):
    """Global NTT engine.  Defaults to the four-step MXU formulation
    (arith/ntt_mxu.py); set SPIRAL_NTT=stockham for the butterfly engine.
    The two use different (self-consistent) evaluation orderings, so one
    engine must be used for all ring data in a process."""
    import os
    if d not in _crt_ntt_cache:
        engine = os.environ.get("SPIRAL_NTT", "mxu")
        if engine == "stockham":
            _crt_ntt_cache[d] = CrtNtt(d)
        elif engine == "pallas":
            from .ntt_pallas import CrtNttPallas
            _crt_ntt_cache[d] = CrtNttPallas(d)
        else:
            from .ntt_mxu import CrtNttMxu
            _crt_ntt_cache[d] = CrtNttMxu(d)
    return _crt_ntt_cache[d]
