"""Pallas-fused four-step negacyclic NTT.

Same mathematics and tables as arith/ntt_mxu.FourStepNtt (identical
evaluation ordering — the engines are interchangeable per transform), but
the limb split, both MXU matmuls, the twiddle pass and the limb
recombination for a tile of polynomials all execute inside one kernel, so
the int32 limb-product intermediates (4x the data) never touch HBM.

Enable with SPIRAL_NTT=pallas (falls back to the XLA engine on platforms
without Mosaic).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import B_I, P_I
from .ntt_mxu import LIMB_BITS, N_LIMBS, FourStepNtt

TILE = 64  # polys per kernel invocation (VMEM-bounded)


def _reduce_u32_const(v, p: int):
    """v mod p for u32 v (two-word Barrett with compile-time constants)."""
    f = (1 << 64) // p
    r1, r0 = np.uint32(f >> 32), np.uint32(f & 0xFFFFFFFF)

    def mul32_wide(a, b):
        a0 = a & np.uint32(0xFFFF)
        a1 = a >> 16
        b0 = b & np.uint32(0xFFFF)
        b1 = b >> 16
        lo = a0 * b0
        m1 = a1 * b0
        m2 = a0 * b1
        hi = a1 * b1
        t = (lo >> 16) + (m1 & np.uint32(0xFFFF)) + (m2 & np.uint32(0xFFFF))
        return hi + (m1 >> 16) + (m2 >> 16) + (t >> 16)

    z = mul32_wide(v, r0)
    # low product of v * r1 plus carry bookkeeping
    a0 = v & np.uint32(0xFFFF)
    a1 = v >> 16
    b0 = r1 & np.uint32(0xFFFF)
    b1 = r1 >> 16
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    t = (lo >> 16) + (m1 & np.uint32(0xFFFF)) + (m2 & np.uint32(0xFFFF))
    l1 = (t << 16) | (lo & np.uint32(0xFFFF))
    h1 = (a1 * b1) + (m1 >> 16) + (m2 >> 16) + (t >> 16)
    s = l1 + z
    q = h1 + (s < l1).astype(jnp.uint32)
    pp = np.uint32(p)
    r = v - q * pp
    r = jnp.where(r >= pp, r - pp, r)
    r = jnp.where(r >= pp, r - pp, r)
    return r


def _mulmod_shoup_const(y, w, w_shoup, p: int):
    y0 = y & np.uint32(0xFFFF)
    y1 = y >> 16
    w0 = w_shoup & np.uint32(0xFFFF)
    w1 = w_shoup >> 16
    lo = y0 * w0
    m1 = y1 * w0
    m2 = y0 * w1
    t = (lo >> 16) + (m1 & np.uint32(0xFFFF)) + (m2 & np.uint32(0xFFFF))
    q = (y1 * w1) + (m1 >> 16) + (m2 >> 16) + (t >> 16)
    pp = np.uint32(p)
    r = w * y - q * pp
    return jnp.where(r >= pp, r - pp, r)


def _limbs(x):
    return [((x >> np.uint32(LIMB_BITS * j)) & np.uint32(0x7F)
             ).astype(jnp.int8) for j in range(N_LIMBS)]


def _mm_kernel(x3, Wl, p: int, rw2: int, rw2_shoup: int):
    """x3: (T, A, K) u32 values; Wl: (4K, N*4) int8 (prescaled per limb).
    Contracts the last axis; returns (T, A, N) u32 mod p."""
    T, A, K = x3.shape
    xl = jnp.concatenate(_limbs(x3), axis=-1)     # (T, A, 4K) j-major? no:
    # _limbs gives 4 planes each (T, A, K); concat => limb-major blocks of K
    out = jax.lax.dot_general(
        xl.reshape(T * A, N_LIMBS * K), Wl,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # (T*A, N*4)
    N = Wl.shape[1] // N_LIMBS
    v = out.reshape(T, A, N, N_LIMBS)
    s01 = v[..., 0] + (v[..., 1] << 7)
    s23 = v[..., 2] + (v[..., 3] << 7)
    r01 = _reduce_u32_const(s01.astype(jnp.uint32), p)
    r23 = _reduce_u32_const(s23.astype(jnp.uint32), p)
    r23 = _mulmod_shoup_const(r23, np.uint32(rw2), np.uint32(rw2_shoup), p)
    s = r01 + r23
    return jnp.where(s >= np.uint32(p), s - np.uint32(p), s)


@lru_cache(maxsize=None)
def _engine(p: int, d: int) -> FourStepNtt:
    return FourStepNtt(p, d)


def _fwd_kernel_factory(p: int, d: int):
    eng = _engine(p, d)
    d1, d2 = eng.d1, eng.d2
    rw2 = int(eng._rw[2])
    rw2s = int(eng._rw_shoup[2])

    def kernel(x_ref, w1_ref, tf_ref, tfs_ref, w2_ref, o_ref):
        x = x_ref[...]                            # (TILE, d)
        v = x.reshape(TILE, d1, d2)
        # step 1: contract a -> (TILE, b, c); reorder to (TILE, d2, d1)
        vt = jnp.swapaxes(v, 1, 2)                # (TILE, d2=b, d1=a)
        y = _mm_kernel(vt, w1_ref[...], p, rw2, rw2s)       # (TILE, b, c)
        y = _mulmod_shoup_const(y, tf_ref[...][None],
                                tfs_ref[...][None], p)
        z = jnp.swapaxes(y, 1, 2)                 # (TILE, c, b)
        z = _mm_kernel(z, w2_ref[...], p, rw2, rw2s)        # (TILE, c, e)
        o_ref[...] = z.reshape(TILE, d)

    tables = (eng.W1f, eng.Tf, eng.Tf_shoup, eng.W2f)
    return kernel, tables


def _inv_kernel_factory(p: int, d: int):
    eng = _engine(p, d)
    d1, d2 = eng.d1, eng.d2
    rw2 = int(eng._rw[2])
    rw2s = int(eng._rw_shoup[2])

    def kernel(x_ref, w2_ref, ti_ref, tis_ref, w1_ref, o_ref):
        x = x_ref[...]
        v = x.reshape(TILE, d1, d2)               # (c, e)
        y = _mm_kernel(v, w2_ref[...], p, rw2, rw2s)        # (TILE, c, b)
        y = jnp.swapaxes(y, 1, 2)                 # (TILE, b, c)
        y = _mulmod_shoup_const(y, ti_ref[...][None],
                                tis_ref[...][None], p)
        z = _mm_kernel(y, w1_ref[...], p, rw2, rw2s)        # (TILE, b, a)
        z = jnp.swapaxes(z, 1, 2)                 # (TILE, a, b)
        o_ref[...] = z.reshape(TILE, d)

    tables = (eng.W2i, eng.Ti, eng.Ti_shoup, eng.W1i)
    return kernel, tables


def _run(x, kernel, tables, d: int, interpret: bool):
    """x: (..., d) u32 -> same shape, tiling the flattened batch."""
    shape = x.shape
    flat = x.reshape(-1, d)
    n = flat.shape[0]
    pad = (-n) % TILE
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, d), dtype=jnp.uint32)], axis=0)
    tiles = flat.shape[0] // TILE
    table_specs = [
        pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.uint32),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((TILE, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + table_specs,
        out_specs=pl.BlockSpec((TILE, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, *[jnp.asarray(t) for t in tables])
    if pad:
        out = out[:n]
    return out.reshape(shape)


class CrtNttPallas:
    """Drop-in engine: transforms arrays shaped (..., 2, d)."""

    def __init__(self, d: int, interpret: bool | None = None):
        import jax as _jax
        self.d = d
        if interpret is None:
            interpret = _jax.default_backend() != "tpu"
        self._interpret = interpret
        self._fk = {p: _fwd_kernel_factory(p, d) for p in (P_I, B_I)}
        self._ik = {p: _inv_kernel_factory(p, d) for p in (P_I, B_I)}
        self.forward = jax.jit(self._forward)
        self.inverse = jax.jit(self._inverse)

    def _forward(self, x):
        return jnp.stack(
            [_run(x[..., 0, :], *self._fk[P_I], self.d, self._interpret),
             _run(x[..., 1, :], *self._fk[B_I], self.d, self._interpret)],
            axis=-2)

    def _inverse(self, x):
        return jnp.stack(
            [_run(x[..., 0, :], *self._ik[P_I], self.d, self._interpret),
             _run(x[..., 1, :], *self._ik[B_I], self.d, self._interpret)],
            axis=-2)


@lru_cache(maxsize=None)
def crt_ntt_pallas(d: int) -> CrtNttPallas:
    return CrtNttPallas(d)
