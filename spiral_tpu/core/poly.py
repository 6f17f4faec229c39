"""Matrix-of-polynomials algebra on CRT residue tensors.

TPU-native counterpart of the reference's MatPoly value type and free
functions (ref: include/poly.h:24-135, src/poly.cpp).  A matrix of R_Q
polynomials is a u32 tensor shaped (..., rows, cols, 2, d) holding the two
CRT residues; the same layout is used in coefficient and NTT domain (the
domain lives in the wrapper, mirroring the reference's isNTT flag).  Unlike
the reference, coefficient-domain values are *also* residue pairs — the
56-bit lift exists only transiently inside gadget decomposition and
rescaling (see core/gadget.py), which removes every 64-bit integer from
the compute path.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..params import B_I, P_I, Q
from ..arith.mod import mod_ctx
from ..arith.crt import const_residues
from ..arith.ntt import crt_ntt

MODS = (P_I, B_I)
# Host constant (never a jnp array: caching device arrays created inside a
# jit trace would leak tracers).
_P_VEC_NP = np.array([[P_I], [B_I]], dtype=np.uint32)


def _p_vec():
    return _P_VEC_NP


# ---- raw tensor ops (shape (..., 2, d) trailing) ---------------------------

def add_raw(a, b):
    p = _p_vec()
    s = a + b
    return jnp.where(s >= p, s - p, s)


def sub_raw(a, b):
    p = _p_vec()
    s = a + p - b
    return jnp.where(s >= p, s - p, s)


def neg_raw(a):
    p = _p_vec()
    s = p - a
    return jnp.where(s >= p, s - p, s)


def mul_raw(a, b):
    """Elementwise product of residue tensors (NTT-domain pointwise mult)."""
    outs = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        outs.append(ctx.mul(a[..., li, :], b[..., li, :]))
    return jnp.stack(outs, axis=-2)


import functools
import jax


@functools.partial(jax.jit, static_argnames=("chunk",))
def matmul_raw(a, b, chunk: int = 16):
    """NTT-domain matrix product (ref: src/poly.cpp:34-78).

    a: (..., R, M, 2, d), b: (..., M, C, 2, d) -> (..., R, C, 2, d).

    Uses 14-bit half-product decomposition so all accumulations stay inside
    u32 lanes: per chunk of <=16 contraction terms the four half-product
    partial sums are < 2^32, then each is Barrett-reduced and recombined
    with 2^14 / 2^28 shifts (the u32 analog of the reference's deferred
    reduction trick at poly.cpp:62).
    """
    M = a.shape[-3]
    assert b.shape[-4] == M
    outs = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        A = a[..., li, :]   # (..., R, M, d)
        B = b[..., li, :]   # (..., M, C, d)
        A0, A1 = A & jnp.uint32(0x3FFF), A >> 14
        B0, B1 = B & jnp.uint32(0x3FFF), B >> 14
        acc = None
        for start in range(0, M, chunk):
            end = min(start + chunk, M)
            sl = slice(start, end)

            def psum(X, Y):
                # (..., R, m, d) x (..., m, C, d) -> (..., R, C, d) in u32
                return jnp.sum(
                    X[..., :, sl, None, :] * Y[..., None, sl, :, :], axis=-3)

            p00 = ctx.reduce_u32(psum(A0, B0))
            p01 = ctx.reduce_u32(psum(A0, B1))
            p10 = ctx.reduce_u32(psum(A1, B0))
            p11 = ctx.reduce_u32(psum(A1, B1))
            mid = ctx.add(p01, p10)
            # mid * 2^14 and p11 * 2^28, each < p * 2^28 < 2^56
            mid_r = ctx.reduce_pair(mid >> 18, mid << 14)
            hi_r = ctx.reduce_pair(p11 >> 4, p11 << 28)
            term = ctx.add(ctx.add(p00, mid_r), hi_r)
            acc = term if acc is None else ctx.add(acc, term)
        outs.append(acc)
    return jnp.stack(outs, axis=-2)


def scalar_mul_raw(sp, a):
    """Multiply every entry of `a` by the single poly `sp` (shape (..,2,d)).

    NTT-domain (ref: src/poly.cpp:190-213).
    """
    outs = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        outs.append(ctx.mul(a[..., li, :], sp[..., li, :]))
    return jnp.stack(outs, axis=-2)


@lru_cache(maxsize=None)
def _automorph_tables(d: int, t: int):
    """Gather indices + negation mask for x -> x^t (ref: poly.cpp:240-261)."""
    src = np.zeros(d, dtype=np.int32)
    neg = np.zeros(d, dtype=bool)
    for i in range(d):
        j = (i * t) % d
        src[j] = i
        neg[j] = ((i * t) // d) % 2 == 1
    return src, neg  # host arrays: safe to cache across jit traces


@functools.partial(jax.jit, static_argnames=("t",))
def automorph_raw(a, t: int):
    """tau_t in coefficient domain: out[(i*t) mod d] = +/- a[i]."""
    d = a.shape[-1]
    src, neg = _automorph_tables(d, t)
    v = a[..., src]
    return jnp.where(neg, neg_raw(v), v)


# ---- PolyMat wrapper --------------------------------------------------------

@dataclasses.dataclass
class PolyMat:
    """rows x cols matrix of ring elements; domain tracked explicitly."""

    data: jnp.ndarray   # (rows, cols, 2, d) u32
    ntt: bool

    @property
    def rows(self) -> int:
        return self.data.shape[-4]

    @property
    def cols(self) -> int:
        return self.data.shape[-3]

    @property
    def d(self) -> int:
        return self.data.shape[-1]

    # -- constructors --
    @staticmethod
    def zeros(rows: int, cols: int, d: int, ntt: bool = False) -> "PolyMat":
        return PolyMat(jnp.zeros((rows, cols, 2, d), dtype=jnp.uint32), ntt)

    @staticmethod
    def from_host(arr: np.ndarray, ntt: bool = False) -> "PolyMat":
        """arr: object/int array (rows, cols, d) of values mod Q (any sign)."""
        arr = np.asarray(arr, dtype=object)
        x = (arr % P_I).astype(np.uint32)
        y = (arr % B_I).astype(np.uint32)
        return PolyMat(jnp.asarray(np.stack([x, y], axis=-2)), ntt)

    @staticmethod
    def single(value: int, d: int) -> "PolyMat":
        """1x1 constant polynomial (ref: poly.cpp:386-390)."""
        x, y = const_residues(value)
        data = np.zeros((1, 1, 2, d), dtype=np.uint32)
        data[0, 0, 0, 0] = x
        data[0, 0, 1, 0] = y
        return PolyMat(jnp.asarray(data), ntt=False)

    @staticmethod
    def monomial(coef: int, idx: int, d: int) -> "PolyMat":
        x, y = const_residues(coef)
        data = np.zeros((1, 1, 2, d), dtype=np.uint32)
        data[0, 0, 0, idx] = x
        data[0, 0, 1, idx] = y
        return PolyMat(jnp.asarray(data), ntt=False)

    # -- domain conversion --
    def to_ntt(self) -> "PolyMat":
        assert not self.ntt
        return PolyMat(crt_ntt(self.d).forward(self.data), True)

    def from_ntt(self) -> "PolyMat":
        assert self.ntt
        return PolyMat(crt_ntt(self.d).inverse(self.data), False)

    def as_ntt(self) -> "PolyMat":
        return self if self.ntt else self.to_ntt()

    def as_coeff(self) -> "PolyMat":
        return self.from_ntt() if self.ntt else self

    # -- algebra --
    def __add__(self, o: "PolyMat") -> "PolyMat":
        assert self.ntt == o.ntt
        return PolyMat(add_raw(self.data, o.data), self.ntt)

    def __sub__(self, o: "PolyMat") -> "PolyMat":
        assert self.ntt == o.ntt
        return PolyMat(sub_raw(self.data, o.data), self.ntt)

    def __neg__(self) -> "PolyMat":
        return PolyMat(neg_raw(self.data), self.ntt)

    def __matmul__(self, o: "PolyMat") -> "PolyMat":
        assert self.ntt and o.ntt
        return PolyMat(matmul_raw(self.data, o.data), True)

    def scalar_mul(self, sp: "PolyMat") -> "PolyMat":
        """Multiply by a 1x1 poly (ref mul_by_const)."""
        assert self.ntt and sp.ntt
        return PolyMat(scalar_mul_raw(sp.data[0, 0], self.data), True)

    def automorph(self, t: int) -> "PolyMat":
        assert not self.ntt
        return PolyMat(automorph_raw(self.data, t), False)

    def mul_const(self, c: int) -> "PolyMat":
        """Multiply by an integer constant (domain-agnostic)."""
        sp = jnp.array(const_residues(c), dtype=jnp.uint32).reshape(2, 1)
        outs = []
        for li, p in enumerate(MODS):
            ctx = mod_ctx(p)
            outs.append(ctx.mul(self.data[..., li, :], sp[li]))
        return PolyMat(jnp.stack(outs, axis=-2), self.ntt)

    # -- block ops (ref: poly.cpp cop/place/pick/vertical_merge) --
    def place(self, sub: "PolyMat", r: int, c: int) -> "PolyMat":
        assert self.ntt == sub.ntt
        return PolyMat(
            self.data.at[r:r + sub.rows, c:c + sub.cols].set(sub.data),
            self.ntt)

    def pick(self, r: int, c: int, nrows: int, ncols: int) -> "PolyMat":
        return PolyMat(self.data[r:r + nrows, c:c + ncols], self.ntt)

    @staticmethod
    def vstack(a: "PolyMat", b: "PolyMat") -> "PolyMat":
        assert a.ntt == b.ntt
        return PolyMat(jnp.concatenate([a.data, b.data], axis=0), a.ntt)

    @staticmethod
    def hstack(a: "PolyMat", b: "PolyMat") -> "PolyMat":
        assert a.ntt == b.ntt
        return PolyMat(jnp.concatenate([a.data, b.data], axis=1), a.ntt)

    # -- host export --
    def to_host_int(self) -> np.ndarray:
        """(rows, cols, d) object array of canonical values in [0, Q)."""
        from ..arith.crt import residues_to_int
        assert not self.ntt
        h = np.asarray(self.data)
        return residues_to_int(h[..., 0, :], h[..., 1, :])

    def to_host_centered(self) -> np.ndarray:
        v = self.to_host_int()
        return np.where(v >= Q // 2, v - Q, v)


jax.tree_util.register_pytree_node(
    PolyMat,
    lambda pm: ((pm.data,), pm.ntt),
    lambda ntt, children: PolyMat(children[0], ntt),
)
