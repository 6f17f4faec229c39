"""Pallas-fused four-step negacyclic NTT (Mosaic/TPU).

Motivation: the XLA four-step engine (arith/ntt_mxu.py) materialises every
int32 matmul output and recombination intermediate in HBM (~10x the data),
which caps it well below the VPU/MXU roof on v5e.  This kernel keeps the
whole transform of a tile of polynomials in VMEM: limb split, both MXU
matmuls, the twiddle pass and both limb recombinations fuse into one
kernel, and BOTH CRT limbs run in one pallas_call (grid (limb, tiles)
with limb-stacked tables), so the (..., 2, d) residue tensors flow
through without any XLA-side slice/stack copies.

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

Exact integer arithmetic on the MXU uses the prescaled-limb trick (data
split into four 7-bit int8 limbs joining the contraction; matrix limbs
form the output minor axis, i-MAJOR so recombination slices whole blocks);
intermediates live e-major ((e, tile, lane)) so the only relayout is the
final (e, t, c) -> (t, e*128+c) store.  Modular reductions use the
Solinas form of both CRT moduli (see _reduce_u32) to stay VPU-light.

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

import os

LIMB_BITS = 7
N_LIMBS = 4
D1 = 16     # second-minor factor (contracted by the small matmul)
D2 = 128    # minor factor (contracted by the big matmul)
TILE = int(os.environ.get("SPIRAL_NTT_TILE", "64"))  # polys per invocation


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

        # forward.  m1T is the transposed prescaled M1f so the small
        # matmul runs matrix-on-the-left, producing e-major output.
        M1f = (_powmat(pow(w, D2, p), D1, D1, p).astype(object) *
               np.array([pow(psi, D2 * b, p) for b in range(D1)],
                        dtype=object)[:, None]) % p      # [b, e]
        Tf = (_powmat(w, D1, D2, p).astype(object) *
              np.array([pow(psi, a, p) for a in range(D2)],
                       dtype=object)[None, :]) % p       # [e, a]
        W2f = _powmat(pow(w, D1, p), D2, D2, p)          # [a, c]
        # raw (unprescaled) forward matrices, kept for host-side constant
        # transforms (_bias_row computes bias*NTT(ones) for the i8 path)
        self.M1f_raw = M1f.astype(np.uint64)
        self.W2f_raw = W2f.astype(np.uint64)
        self.m1fT = np.ascontiguousarray(
            _prescaled_imajor(M1f.astype(np.uint32), p).T)       # (64, 64)
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
        self.m2iT = np.ascontiguousarray(
            _prescaled_imajor(M2i.astype(np.uint32), p).T)      # (64, 64)
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
    """v mod p for any u32 v.  Both CRT moduli are Solinas-form
    (p = 2^28 - c with 2^28 + 16c < 2p), so v = hi*2^28 + lo reduces as
    lo + hi*c with one conditional subtract — the cheap path that keeps
    this kernel VPU-light (mirrors mod.ModContext.reduce_u32)."""
    p = jnp.uint32(tb.p)
    c = (1 << 28) - tb.p
    bound = (1 << 28) + 16 * c
    if bound < 2 * tb.p or (1 << 28) + (bound >> 28) * c < 2 * tb.p:
        mask = jnp.uint32((1 << 28) - 1)
        s = (v & mask) + (v >> 28) * jnp.uint32(c)
        if bound >= 2 * tb.p:
            s = (s & mask) + (s >> 28) * jnp.uint32(c)
        return jnp.where(s >= p, s - p, s)
    r1, r0 = tb.ratio
    z = _umulhi(v, jnp.uint32(r0))
    h1 = _umulhi(v, jnp.uint32(r1))
    l1 = _mullo(v, jnp.uint32(r1))
    s = l1 + z
    q = h1 + (s < l1).astype(jnp.uint32)
    r = v - q * p
    r = jnp.where(r >= p, r - p, r)
    return jnp.where(r >= p, r - p, r)


def _mul_shoup(y, w, w_shoup, p: int):
    q = _umulhi(y, w_shoup)
    pp = jnp.uint32(p)
    r = w * y - q * pp
    return jnp.where(r >= pp, r - pp, r)


def _recombine(o0, o1, o2, o3, tb: _Tables, off: int = 0):
    """sum_i 2^{7i} o_i mod p for int32 limb planes.

    Lazy: the 2^14 Shoup multiply runs directly on the unreduced pair-sum
    (Shoup r = w*y - floor(y*ws/2^32)*p < 2p holds for ANY u32 y when
    w < p), and only ONE Solinas reduce closes the sum — measured ~35%
    fewer VPU ops than reduce-reduce-shoup-add.  Bounds: |o_i| < 2^26
    (uns.: K<=512 products <=127^2; signed i8 path: K<=16*128*127 < 2^18),
    so with `off` (a multiple of p shifting signed planes positive, 0 for
    unsigned) each pair-sum < 2^31 and the final sum < 2^31 + 2p < 2^32."""
    y23 = (o2 + (o3 << 7) + jnp.int32(off)).astype(jnp.uint32)
    r23 = _mul_shoup(y23, jnp.uint32(tb.rw2), jnp.uint32(tb.rw2_shoup),
                     tb.p)
    s = (o0 + (o1 << 7) + jnp.int32(off)).astype(jnp.uint32) + r23
    return _reduce_u32(s, tb)


def _limb_planes(v):
    return [((v >> jnp.uint32(LIMB_BITS * j)) & jnp.uint32(0x7F)
             ).astype(jnp.int8) for j in range(N_LIMBS)]


def _recombine_signed(o0, o1, o2, o3, tb: _Tables):
    """_recombine for SIGNED int32 limb planes (|o_i| < 2^18, from an
    int8 single-limb matmul): the p offset (== 0 mod p, far above the
    2^25 pair-sum bound) shifts each pair-sum into u32 range (ADVICE r4:
    one recombination body, signed = offset p, unsigned = offset 0)."""
    return _recombine(o0, o1, o2, o3, tb, off=tb.p)


@lru_cache(maxsize=None)
def _bias_row(p: int, d: int, bias: int) -> np.ndarray:
    """Engine-order forward NTT of the constant polynomial
    bias*(1 + x + ... + x^{d-1}) as a (d,) u32 host row.  Added after an
    int8 transform of (digits - bias), this undoes the bias by NTT
    linearity (lets unsigned 8-bit digits ride signed int8)."""
    tb = _tables(p, d)
    G = tb.M1f_raw.astype(object).sum(axis=0) % p            # [e]
    H = (tb.tf.astype(object) * G[:, None]) % p              # [e, a]
    X = (H @ tb.W2f_raw.astype(object)) % p                  # [e, c]
    return ((X * bias) % p).astype(np.uint32).reshape(d)     # o~ = 128e+c


def _fwd_body_i8(tb: _Tables, d: int, x8, m1T, tf, tfs, w2):
    """Forward transform of SMALL-VALUE rows: x8 (T, d) int8 whose entries
    v satisfy v ≡ x (mod p) for the intended input x (gadget digits are
    at most 8 bits wide at production widths, so one signed limb replaces
    the four 7-bit planes of _fwd_body).  Single-limb first matmul against
    the j=0 block of the prescaled table + signed recombination; the rest
    of the transform is identical, so the output is bit-exact vs
    _fwd_body on the canonical residues of the same values."""
    T = x8.shape[0]
    v = x8.reshape(T, D1, D2)
    o1 = jax.lax.dot_general(
        v, jnp.swapaxes(m1T[:, :D1], 0, 1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (T, 128a, 64ie)
    o1 = jnp.swapaxes(o1, -1, -2)                     # (T, 64, 128)
    g = _recombine_signed(o1[:, 0:D1], o1[:, D1:2 * D1],
                          o1[:, 2 * D1:3 * D1], o1[:, 3 * D1:], tb)
    h = _mul_shoup(g, tf[None], tfs[None], tb.p)      # (T, 16, 128)
    l2 = jnp.concatenate(_limb_planes(h), axis=-1)    # (T, 16, 512)
    o2 = jax.lax.dot_general(
        l2, w2,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (T, 16, 512)
    z = _recombine(o2[..., 0:D2], o2[..., D2:2 * D2],
                   o2[..., 2 * D2:3 * D2], o2[..., 3 * D2:], tb)
    return z.reshape(T, d)                            # o~ = 128e + c


_EMAJOR = os.environ.get("SPIRAL_NTT_FORM", "tmajor") == "emajor"


def _fwd_body(tb: _Tables, d: int, x, m1T, tf, tfs, w2):
    """One limb's forward transform; x (T, d) -> (T, d) u32 (any row
    count T — the standalone engine passes TILE, the fused fold/expand
    kernels pass their own batch heights)."""
    TILE = x.shape[0]
    if _EMAJOR:
        v = x.reshape(TILE, D1, D2)                       # [t, b, a]
        l1 = jnp.concatenate(_limb_planes(v), axis=-2)    # (TILE, 64, 128)
        # matrix-on-the-left: out[(i,e), t, a] — e-major intermediates
        o1 = jax.lax.dot_general(
            m1T, l1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)             # (64, TILE, 128)
        g = _recombine(o1[0:D1], o1[D1:2 * D1],
                       o1[2 * D1:3 * D1], o1[3 * D1:], tb)
        h = _mul_shoup(g, tf[:, None, :], tfs[:, None, :], tb.p)
        l2 = jnp.concatenate(_limb_planes(h), axis=-1)    # (16, TILE, 512)
        o2 = jax.lax.dot_general(
            l2, w2,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (16, TILE, 512)
        z = _recombine(o2[..., 0:D2], o2[..., D2:2 * D2],
                       o2[..., 2 * D2:3 * D2], o2[..., 3 * D2:], tb)
        return jnp.swapaxes(z, 0, 1).reshape(TILE, d)     # (t, 128e + c)

    v = x.reshape(TILE, D1, D2)                       # [t, b, a]
    l1 = jnp.concatenate(_limb_planes(v), axis=-2)    # (TILE, 64, 128)
    o1 = jax.lax.dot_general(
        l1, jnp.swapaxes(m1T, 0, 1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (TILE, 128a, 64ie)
    o1 = jnp.swapaxes(o1, -1, -2)                     # (TILE, 64, 128)
    g = _recombine(o1[:, 0:D1], o1[:, D1:2 * D1],
                   o1[:, 2 * D1:3 * D1], o1[:, 3 * D1:], tb)
    h = _mul_shoup(g, tf[None], tfs[None], tb.p)      # (TILE, 16, 128)
    l2 = jnp.concatenate(_limb_planes(h), axis=-1)    # (TILE, 16, 512)
    o2 = jax.lax.dot_general(
        l2, w2,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (TILE, 16, 512)
    z = _recombine(o2[..., 0:D2], o2[..., D2:2 * D2],
                   o2[..., 2 * D2:3 * D2], o2[..., 3 * D2:], tb)
    return z.reshape(TILE, d)                         # o~ = 128e + c


def _inv_body(tb: _Tables, d: int, x, m1, ti, tis, m2T):
    """One limb's inverse transform; x (T, d) NTT order -> coeff (any
    row count T, like _fwd_body)."""
    TILE = x.shape[0]
    if _EMAJOR:
        v = x.reshape(TILE, D1, D2)                       # [t, e, c]
        ve = jnp.swapaxes(v, 0, 1)                        # (16e, TILE, 128c)
        l1 = jnp.concatenate(_limb_planes(ve), axis=-1)   # (16, TILE, 512)
        o1 = jax.lax.dot_general(
            l1, m1,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (16, TILE, 512)
        g = _recombine(o1[..., 0:D2], o1[..., D2:2 * D2],
                       o1[..., 2 * D2:3 * D2], o1[..., 3 * D2:], tb)
        h = _mul_shoup(g, ti[:, None, :], tis[:, None, :], tb.p)
        l2 = jnp.concatenate(_limb_planes(h), axis=-3)    # (64, TILE, 128)
        o2 = jax.lax.dot_general(
            m2T, l2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (64b, TILE, 128a)
        z = _recombine(o2[0:D1], o2[D1:2 * D1],
                       o2[2 * D1:3 * D1], o2[3 * D1:], tb)
        return jnp.swapaxes(z, 0, 1).reshape(TILE, d)     # (t, a + 128 b)

    v = x.reshape(TILE, D1, D2)                       # [t, e, c]
    l1 = jnp.concatenate(_limb_planes(v), axis=-1)    # (TILE, 16, 512)
    o1 = jax.lax.dot_general(
        l1, m1,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (TILE, 16, 512)
    g = _recombine(o1[..., 0:D2], o1[..., D2:2 * D2],
                   o1[..., 2 * D2:3 * D2], o1[..., 3 * D2:], tb)
    h = _mul_shoup(g, ti[None], tis[None], tb.p)      # (TILE, 16, 128)
    l2 = jnp.concatenate(_limb_planes(h), axis=-2)    # (TILE, 64, 128)
    o2 = jax.lax.dot_general(
        l2, jnp.swapaxes(m2T, 0, 1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (TILE, 128a, 64ib)
    o2 = jnp.swapaxes(o2, -1, -2)                     # (TILE, 64, 128)
    z = _recombine(o2[:, 0:D1], o2[:, D1:2 * D1],
                   o2[:, 2 * D1:3 * D1], o2[:, 3 * D1:], tb)
    return z.reshape(TILE, d)                         # idx = a + 128 b


def _make_kernel(tb_p: _Tables, tb_b: _Tables, d: int, body):
    """Kernel over a (TILE, 2*d) block: columns [0, d) are the p-limb,
    [d, 2d) the b-limb (the contiguous view of (..., 2, d) tensors), each
    transformed with its own tables inside one invocation."""
    def kernel(x_ref, t1_ref, t2_ref, t3_ref, t4_ref, o_ref):
        for li, tb in ((0, tb_p), (1, tb_b)):
            x = x_ref[:, li * d:(li + 1) * d]
            args = (t1_ref[li], t2_ref[li], t3_ref[li], t4_ref[li])
            o_ref[:, li * d:(li + 1) * d] = body(tb, d, x, *args)

    return kernel


def _stack(tp, tb):
    # host numpy: the engine may be constructed inside a jit trace (first
    # crt_ntt() call), so device conversion happens per call in _run
    return np.stack([tp, tb])


class CrtNttPallas:
    """Drop-in engine: transforms arrays shaped (..., 2, d) in ONE
    pallas_call over both CRT limbs."""

    def __init__(self, d: int, interpret: bool | None = None):
        assert d == D1 * D2, \
            f"pallas engine supports d={D1 * D2} only (got {d})"
        self.d = d
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self._interpret = interpret
        tp, tb = _tables(P_I, d), _tables(B_I, d)
        self._fwd_kernel = _make_kernel(tp, tb, d, _fwd_body)
        self._inv_kernel = _make_kernel(tp, tb, d, _inv_body)
        self._fwd_tabs = (_stack(tp.m1fT, tb.m1fT), _stack(tp.tf, tb.tf),
                          _stack(tp.tf_shoup, tb.tf_shoup),
                          _stack(tp.w2f, tb.w2f))
        self._inv_tabs = (_stack(tp.m1i, tb.m1i), _stack(tp.ti, tb.ti),
                          _stack(tp.ti_shoup, tb.ti_shoup),
                          _stack(tp.m2iT, tb.m2iT))
        self.forward = jax.jit(self._forward)
        self.inverse = jax.jit(self._inverse)

    def _run(self, x, kernel, tables):
        d = self.d
        shape = x.shape
        flat = x.reshape(-1, 2 * d)     # contiguous view, no copy
        n = flat.shape[0]
        pad = (-n) % TILE
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, 2 * d), dtype=jnp.uint32)], axis=0)
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
            in_specs=[pl.BlockSpec((TILE, 2 * d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + table_specs,
            out_specs=pl.BlockSpec((TILE, 2 * d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=self._interpret,
        )(flat, *[jnp.asarray(t) for t in tables])
        if pad:
            out = out[:n]
        return out.reshape(shape)

    def _forward(self, x):
        return self._run(x, self._fwd_kernel, self._fwd_tabs)

    def _inverse(self, x):
        return self._run(x, self._inv_kernel, self._inv_tabs)


@lru_cache(maxsize=None)
def _tables(p: int, d: int) -> _Tables:
    return _Tables(p, d)


@lru_cache(maxsize=None)
def crt_ntt_pallas(d: int) -> CrtNttPallas:
    return CrtNttPallas(d)
