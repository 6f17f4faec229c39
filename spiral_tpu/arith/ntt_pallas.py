"""Pallas-fused four-step negacyclic NTT (Mosaic/TPU).

Motivation: the XLA four-step engine (arith/ntt_mxu.py) materialises every
int32 matmul output and recombination intermediate in HBM (~10x the data),
which caps it at ~2M poly-limbs/s on v5e.  This kernel keeps the whole
transform of a tile of polynomials in VMEM: limb split, both MXU matmuls,
the twiddle pass and both limb recombinations fuse into one kernel.

Mosaic-friendly factorisation, d = d1*d2 with d1 = 16, d2 = 128, chosen so
every reshape keeps a minor dim that is a multiple of 128 (Mosaic rejects
lane splits below 128 — verified empirically, tools/probe_mosaic*.py):

  coeff order:  idx = a + 128 b   (b in [0,16) second-minor, a in [0,128))
  NTT order:    o~  = 128 e + c   (e in [0,16), c in [0,128)) — an
                engine-internal permutation of the natural DFT order
                o = 16 c + e; self-consistent, see note below.

  forward:  G[e,a] = sum_b M1f[b,e] x[b,a]          (contract 2nd-minor)
            H[e,a] = Tf[e,a] * G[e,a]               (twiddle, full-lane)
            X[e,c] = sum_a W2f[a,c] H[e,a]          (contract minor)
  with M1f[b,e] = w^{128 e b} psi^{128 b},  Tf[e,a] = w^{e a} psi^a,
       W2f[a,c] = w^{16 a c}   (w = primitive d-th root, psi^2 = w).

  inverse mirrors it: contract c (minor), twiddle Ti[e,a] = w^{-ea}
  psi^{-a}, contract e (2nd-minor) with M2i[e,b] = w^{-128be} psi^{-128b}/d.

Exact integer arithmetic on the MXU uses the same prescaled-limb trick as
ntt_mxu (data split into four 7-bit int8 limbs joining the contraction;
matrix limbs form the output minor axis), but with the output limb axis
i-MAJOR (columns i*N + n) so the recombination slices whole 128-lane (or
16-sublane) blocks instead of needing an unsupported (..., N, 4) reshape.

NOTE: NTT-domain element order differs from ntt_mxu/ntt.py.  All engines
are interchangeable per process (crt_ntt() picks one globally); mixing
engines for the same ring data is invalid, as documented in arith/ntt.py.

Enable with SPIRAL_NTT=pallas (interpret mode off-TPU).  d must satisfy
d = 16 * 128; other sizes fall back to the XLA four-step engine.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import B_I, P_I
from .tables import primitive_root

LIMB_BITS = 7
N_LIMBS = 4
D1 = 16     # second-minor factor (contracted by the small matmul)
D2 = 128    # minor factor (contracted by the big matmul)
TILE = 64   # polys per kernel invocation


def _powmat(base: int, rows: int, cols: int, p: int) -> np.ndarray:
    e = np.outer(np.arange(rows, dtype=object), np.arange(cols, dtype=object))
    return np.vectorize(lambda x: pow(base, int(x), p),
                        otypes=[np.uint64])(e)


def _prescaled_imajor(W: np.ndarray, p: int) -> np.ndarray:
    """(K, N) u32 -> (4K, 4N) int8 with rows (j, k) j-major and columns
    (i, n) i-MAJOR: entry [(j, k), (i, n)] = limb_i((2^{7j} W[k, n]) mod p).
    """
    K, N = W.shape
    out = np.zeros((N_LIMBS, K, N_LIMBS, N), dtype=np.int8)
    for j in range(N_LIMBS):
        Wj = (W.astype(np.uint64) << (LIMB_BITS * j)) % p
        for i in range(N_LIMBS):
            out[j, :, i, :] = ((Wj >> (LIMB_BITS * i)) & 0x7F).astype(np.int8)
    return out.reshape(N_LIMBS * K, N_LIMBS * N)


class _Tables:
    """Per-modulus kernel tables (host numpy)."""

    def __init__(self, p: int, d: int):
        assert d == D1 * D2, d
        self.p = p
        g = primitive_root(p)
        psi = pow(g, (p - 1) // (2 * d), p)
        w = pow(psi, 2, p)
        psi_inv = pow(psi, p - 2, p)
        w_inv = pow(w, p - 2, p)
        d_inv = pow(d, p - 2, p)

        # forward
        M1f = (_powmat(pow(w, D2, p), D1, D1, p).astype(object) *
               np.array([pow(psi, D2 * b, p) for b in range(D1)],
                        dtype=object)[:, None]) % p      # [b, e]
        Tf = (_powmat(w, D1, D2, p).astype(object) *
              np.array([pow(psi, a, p) for a in range(D2)],
                       dtype=object)[None, :]) % p       # [e, a]
        W2f = _powmat(pow(w, D1, p), D2, D2, p)          # [a, c]
        self.m1f = _prescaled_imajor(M1f.astype(np.uint32), p)   # (64, 64)
        self.w2f = _prescaled_imajor(W2f.astype(np.uint32), p)   # (512, 512)
        self.tf = Tf.astype(np.uint32)
        self.tf_shoup = self._shoup(self.tf)

        # inverse
        M1i = _powmat(pow(w_inv, D1, p), D2, D2, p)      # [c, a-hat]
        Ti = (_powmat(w_inv, D1, D2, p).astype(object) *
              np.array([pow(psi_inv, a, p) for a in range(D2)],
                       dtype=object)[None, :]) % p       # [e, a-hat]
        M2i = (_powmat(pow(w_inv, D2, p), D1, D1, p).astype(object) *
               np.array([pow(psi_inv, D2 * b, p) for b in range(D1)],
                        dtype=object)[None, :] * d_inv) % p     # [e, b]
        self.m1i = _prescaled_imajor(M1i.astype(np.uint32), p)  # (512, 512)
        self.m2i = _prescaled_imajor(M2i.astype(np.uint32), p)  # (64, 64)
        self.ti = Ti.astype(np.uint32)
        self.ti_shoup = self._shoup(self.ti)

        # recombination constants
        self.rw2 = (1 << (2 * LIMB_BITS)) % p
        self.rw2_shoup = (self.rw2 << 32) // p
        f = (1 << 64) // p
        self.ratio = (f >> 32, f & 0xFFFFFFFF)

    def _shoup(self, w: np.ndarray) -> np.ndarray:
        return ((w.astype(np.uint64) << np.uint64(32)) //
                np.uint64(self.p)).astype(np.uint32)


def _umulhi(a, b):
    """High 32 bits of u32*u32 via 16-bit splits (Mosaic-safe)."""
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> 16
    b0 = b & jnp.uint32(0xFFFF)
    b1 = b >> 16
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    t = (lo >> 16) + (m1 & jnp.uint32(0xFFFF)) + (m2 & jnp.uint32(0xFFFF))
    return a1 * b1 + (m1 >> 16) + (m2 >> 16) + (t >> 16)


def _mullo(a, b):
    return a * b


def _reduce_u32(v, tb: _Tables):
    """v mod p for any u32 v (two-word Barrett, mirrors mod.reduce_u32)."""
    r1, r0 = tb.ratio
    z = _umulhi(v, jnp.uint32(r0))
    h1 = _umulhi(v, jnp.uint32(r1))
    l1 = _mullo(v, jnp.uint32(r1))
    s = l1 + z
    q = h1 + (s < l1).astype(jnp.uint32)
    p = jnp.uint32(tb.p)
    r = v - q * p
    r = jnp.where(r >= p, r - p, r)
    return jnp.where(r >= p, r - p, r)


def _mul_shoup(y, w, w_shoup, p: int):
    q = _umulhi(y, w_shoup)
    pp = jnp.uint32(p)
    r = w * y - q * pp
    return jnp.where(r >= pp, r - pp, r)


def _recombine(o0, o1, o2, o3, tb: _Tables):
    """sum_i 2^{7i} o_i mod p for int32 limb planes (each < 4K*127^2)."""
    s01 = (o0 + (o1 << 7)).astype(jnp.uint32)
    s23 = (o2 + (o3 << 7)).astype(jnp.uint32)
    r01 = _reduce_u32(s01, tb)
    r23 = _reduce_u32(s23, tb)
    r23 = _mul_shoup(r23, jnp.uint32(tb.rw2), jnp.uint32(tb.rw2_shoup), tb.p)
    s = r01 + r23
    p = jnp.uint32(tb.p)
    return jnp.where(s >= p, s - p, s)


def _limb_planes(v):
    return [((v >> jnp.uint32(LIMB_BITS * j)) & jnp.uint32(0x7F)
             ).astype(jnp.int8) for j in range(N_LIMBS)]


def _fwd_kernel_factory(tb: _Tables, d: int):
    def kernel(x_ref, m1_ref, tf_ref, tfs_ref, w2_ref, o_ref):
        x = x_ref[...]                                    # (TILE, d)
        v = x.reshape(TILE, D1, D2)                       # [b, a]
        l1 = jnp.concatenate(_limb_planes(v), axis=-2)    # (TILE, 64, 128)
        o1 = jax.lax.dot_general(
            l1, m1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (TILE, 128a, 64)
        o1 = jnp.swapaxes(o1, -1, -2)                     # (TILE, 64, 128a)
        g = _recombine(o1[:, 0:D1], o1[:, D1:2 * D1],
                       o1[:, 2 * D1:3 * D1], o1[:, 3 * D1:], tb)
        h = _mul_shoup(g, tf_ref[...][None], tfs_ref[...][None], tb.p)
        l2 = jnp.concatenate(_limb_planes(h), axis=-1)    # (TILE, 16, 512)
        o2 = jax.lax.dot_general(
            l2, w2_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (TILE, 16e, 512)
        z = _recombine(o2[..., 0:D2], o2[..., D2:2 * D2],
                       o2[..., 2 * D2:3 * D2], o2[..., 3 * D2:], tb)
        o_ref[...] = z.reshape(TILE, d)                   # o~ = 128e + c

    tables = (tb.m1f, tb.tf, tb.tf_shoup, tb.w2f)
    return kernel, tables


def _inv_kernel_factory(tb: _Tables, d: int):
    def kernel(x_ref, m1_ref, ti_ref, tis_ref, m2_ref, o_ref):
        x = x_ref[...]                                    # (TILE, d) o~
        v = x.reshape(TILE, D1, D2)                       # [e, c]
        l1 = jnp.concatenate(_limb_planes(v), axis=-1)    # (TILE, 16, 512)
        o1 = jax.lax.dot_general(
            l1, m1_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (TILE, 16e, 512)
        g = _recombine(o1[..., 0:D2], o1[..., D2:2 * D2],
                       o1[..., 2 * D2:3 * D2], o1[..., 3 * D2:], tb)
        h = _mul_shoup(g, ti_ref[...][None], tis_ref[...][None], tb.p)
        l2 = jnp.concatenate(_limb_planes(h), axis=-2)    # (TILE, 64, 128)
        o2 = jax.lax.dot_general(
            l2, m2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (TILE, 128a, 64)
        o2 = jnp.swapaxes(o2, -1, -2)                     # (TILE, 64, 128a)
        z = _recombine(o2[:, 0:D1], o2[:, D1:2 * D1],
                       o2[:, 2 * D1:3 * D1], o2[:, 3 * D1:], tb)
        o_ref[...] = z.reshape(TILE, d)                   # idx = a + 128b

    tables = (tb.m1i, tb.ti, tb.ti_shoup, tb.m2i)
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
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
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


@lru_cache(maxsize=None)
def _tables(p: int, d: int) -> _Tables:
    return _Tables(p, d)


class CrtNttPallas:
    """Drop-in engine: transforms arrays shaped (..., 2, d)."""

    def __init__(self, d: int, interpret: bool | None = None):
        assert d == D1 * D2, \
            f"pallas engine supports d={D1 * D2} only (got {d})"
        self.d = d
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self._interpret = interpret
        self._fk = {p: _fwd_kernel_factory(_tables(p, d), d)
                    for p in (P_I, B_I)}
        self._ik = {p: _inv_kernel_factory(_tables(p, d), d)
                    for p in (P_I, B_I)}
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
