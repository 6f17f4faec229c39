"""Fused coefficient-expansion Pallas kernels.

One expansion round (ref: src/spiral.cpp:1664-1743 expandImproved) is, for
every surviving ciphertext: inverse NTT -> automorphism tau_t -> gadget
decomposition -> forward NTT -> key-switch matmul -> add.  The unfused
path (server/expand.py) materialises the digit tensor in HBM and pads
tiny early-round NTT batches to the standalone engine's TILE; both costs
disappear here.  Two kernels per round:

* K1 (_auto_call): inverse NTT + automorphism.  The automorphism is a
  static +/-1 permutation of the d coefficients; Mosaic has no lane
  gather, so it runs as an int8 permutation matmul on the MXU over the
  four 7-bit limb planes (one nonzero per output => each int32 plane is
  in [-127, 127]; the signed recombination adds a multiple of p before
  the Solinas reduce).

* K2 (_keyswitch_call): gadget digits of row 0 (core/gadget.py impl,
  traced in-kernel), forward NTT of the digits + the row-1 poly, the
  W key-switch matmul (digits as matmul COLUMNS: one ct per output
  column), add into the NTT-domain ct, row-1 poly added to the bottom
  row.  Instantiated per gadget width (evens m_exp / odds m_exp_right).

The ct-doubling scalar multiply by x^{-2^r} stays in XLA (it is one
pointwise op over the whole batch).  Valid only under the Pallas NTT
engine; expand.py dispatches.  Bit-exact vs the unfused path
(tests/test_expand_pallas.py).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import B_I, P_I
from ..arith.mod import mod_ctx
from ..arith.ntt_pallas import (LIMB_BITS, N_LIMBS, _fwd_body, _inv_body,
                                _tables)
from .fold_pallas import _fold_tables, _fwd_tiled, _matmul_limb_2d

MODS = (P_I, B_I)


@lru_cache(maxsize=None)
def _perm_i8(d: int, t: int) -> np.ndarray:
    """(d, d) int8 with P[i, (i*t) % d] = (-1)^((i*t)//d % 2): automorph
    x -> x^t as out = in @ P (ref: src/poly.cpp:240-261)."""
    P = np.zeros((d, d), dtype=np.int8)
    i = np.arange(d)
    o = (i * t) % d
    sgn = np.where(((i * t) // d) % 2 == 1, -1, 1).astype(np.int8)
    P[i, o] = sgn
    return P


def _automorph_limb(x, P, tb):
    """x: (T, d) canonical u32 residues -> tau_t(x) canonical, via the
    +/-1 permutation matmul over 7-bit limb planes."""
    planes = [((x >> jnp.uint32(LIMB_BITS * j)) & jnp.uint32(0x7F)
               ).astype(jnp.int8) for j in range(N_LIMBS)]
    outs = [jax.lax.dot_general(
        pj, P, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32) for pj in planes]
    val = outs[0] + (outs[1] << 7) + (outs[2] << 14) + (outs[3] << 21)
    # |val| < 2^28; shift into u32 range with a multiple of p
    C = tb.p * ((1 << 28) // tb.p + 1)
    v = (val + jnp.int32(C)).astype(jnp.uint32)
    from ..arith.ntt_pallas import _reduce_u32
    return _reduce_u32(v, tb)


def _make_auto_kernel(d: int):
    tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)

    def kernel(cv_ref, perm_ref, i1, i2, i3, i4, out_ref):
        x = cv_ref[...]                           # (T, 2, d) NTT
        P = perm_ref[...]
        outs = []
        for li, tb in ((0, tb_p), (1, tb_b)):
            c = _inv_body(tb, d, x[:, li, :], i1[li], i2[li], i3[li],
                          i4[li])
            outs.append(_automorph_limb(c, P, tb))
        out_ref[...] = jnp.stack(outs, axis=-2)   # (T, 2, d) coeff

    return kernel


@lru_cache(maxsize=None)
def _auto_call(n_polys: int, d: int, tile: int, interpret: bool):
    kernel = _make_auto_kernel(d)
    _, inv = _fold_tables(d)
    table_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in inv
    ]
    grid = (n_polys + tile - 1) // tile

    def run(cv_flat, perm):
        pad = grid * tile - n_polys
        if pad:
            cv_flat = jnp.concatenate(
                [cv_flat, jnp.zeros((pad,) + cv_flat.shape[1:],
                                    dtype=jnp.uint32)], axis=0)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(cv_flat.shape, jnp.uint32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile, 2, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs,
            out_specs=pl.BlockSpec((tile, 2, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(cv_flat, perm, *[jnp.asarray(t) for t in inv])
        return out[:n_polys] if pad else out

    return run


@lru_cache(maxsize=None)
def _tau_slot_perm(d: int, t: int) -> np.ndarray:
    """NTT-domain slot permutation realizing the automorphism tau_t.

    The Pallas engine's slot z = 128e + c holds x(psi^{1 + 2(e + 16c)})
    (arith/ntt_pallas.py factorization: X[e,c] = sum_i x_i psi^i
    w^{i(e+16c)}).  tau_t(x)(psi^u) = x(psi^{u t mod 2d}) and odd*odd
    stays odd, so the Galois action is a PURE slot permutation — no
    coefficient-domain +-1 gather/matmul needed (ref: src/poly.cpp:240-261
    does it in coeff domain; NTT-domain Galois is the standard RLWE
    trick and is ~free on TPU as one XLA gather)."""
    assert t % 2 == 1
    z = np.arange(d)
    e, c = z // 128, z % 128
    u = 1 + 2 * (e + 16 * c)
    u2 = (u * t) % (2 * d)
    o2 = (u2 - 1) // 2
    return (128 * (o2 % 16) + o2 // 16).astype(np.int32)


def inv_ntt_automorph(cv, t: int, interpret: bool):
    """cv: (N, base, 1, 2, d) NTT -> tau_t(invNTT(cv)) coeff domain.

    tau_t runs as an NTT-domain slot gather (one fused XLA gather),
    then a plain engine inverse — the previous automorph-as-int8-
    permutation-matmul kernel (_auto_call) is kept as an ablation
    (SPIRAL_AUTO=matmul)."""
    from ..arith.ntt_pallas import crt_ntt_pallas
    if _os.environ.get("SPIRAL_AUTO", "") == "matmul":
        N, base = cv.shape[0], cv.shape[1]
        d = cv.shape[-1]
        flat = cv.reshape(N * base, 2, d)
        tile = min(32, N * base)
        run = _auto_call(N * base, d, tile, interpret)
        out = run(flat, jnp.asarray(_perm_i8(d, t)))
        return out.reshape(cv.shape)
    d = cv.shape[-1]
    perm = jnp.asarray(_tau_slot_perm(d, t))
    return crt_ntt_pallas(d).inverse(cv[..., perm])


def _unsigned_digit_rows_2d(x_p, x_b, num_elems: int):
    """2D in-kernel unsigned gadget: x_p/x_b (T, d) residue planes of the
    same values -> per-limb digit-row tensors [(num_elems*T, d)] x 2,
    rows k-major (digit k's block of T rows at k*T).  Mirrors
    core.gadget.gadget_invert_impl on flat planes (full-sublane ops)."""
    from ..params import get_bits_per
    from ..arith.crt import lift_pair
    from ..arith.u32 import shr_pair

    bits_per = get_bits_per(num_elems)
    hi, lo = lift_pair(x_p, x_b)
    mask = jnp.uint32((1 << bits_per) - 1) if bits_per < 32 else \
        jnp.uint32(0xFFFFFFFF)
    digs = []
    for k in range(num_elems):
        assert k * bits_per < 64
        _, piece = shr_pair(hi, lo, k * bits_per)
        digs.append(piece & mask)
    if bits_per < 28:
        rows = jnp.concatenate(digs, axis=0)
        return rows, rows
    outs = []
    for p in MODS:
        ctx = mod_ctx(p)
        outs.append(jnp.concatenate([ctx.reduce_u32(dg) for dg in digs],
                                    axis=0))
    return outs[0], outs[1]


def _unsigned_digit_rows_i8(x_p, x_b, num_elems: int, bias: int):
    """Unsigned gadget digits as ONE int8 tensor shared by both CRT
    limbs: (T, d) residue planes -> (num_elems*T, d) int8, rows k-major,
    entry = digit - bias.  Valid for bits_per <= 8 (bias = 128 recenters
    8-bit digits into int8; the caller adds bias*NTT(ones) back after the
    transform — NTT linearity)."""
    from ..params import get_bits_per
    from ..arith.crt import lift_pair
    from ..arith.u32 import shr_pair

    bits_per = get_bits_per(num_elems)
    assert bits_per <= 8, bits_per
    hi, lo = lift_pair(x_p, x_b)
    mask = jnp.uint32((1 << bits_per) - 1)
    rows = []
    for k in range(num_elems):
        assert k * bits_per < 64
        _, piece = shr_pair(hi, lo, k * bits_per)
        rows.append(((piece & mask).astype(jnp.int32) -
                     jnp.int32(bias)).astype(jnp.int8))
    return jnp.concatenate(rows, axis=0)


def _ks_i8_bias(m: int) -> tuple[bool, int]:
    """(use int8 digit path, digit bias) for gadget width m."""
    from ..params import get_bits_per
    bits_per = get_bits_per(m)
    return bits_per <= 8, (128 if bits_per == 8 else 0)


def _make_keyswitch_kernel(m: int, base: int, d: int, T: int):
    from .fold_pallas import _fwd_tiled_i8
    tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)
    i8, bias = _ks_i8_bias(m)

    def kernel(cv_ref, ca_ref, w_ref, f1, f2, f3, f4, *rest):
        out_ref = rest[-1]
        corr_ref = rest[0] if bias else None
        ca = ca_ref[...]                          # (T, base, 2, d) coeff
        if i8:
            rows8 = _unsigned_digit_rows_i8(
                ca[:, 0, 0, :], ca[:, 0, 1, :], m, bias)  # (m*T, d) int8
            rp = rb = None
        else:
            rp, rb = _unsigned_digit_rows_2d(
                ca[:, 0, 0, :], ca[:, 0, 1, :], m)        # (m*T, d) k-major
        fwd = (f1, f2, f3, f4)
        cv = cv_ref[...]                          # (T, base, 2, d) NTT
        planes = []
        for li, tb, rows in ((0, tb_p, rp), (1, tb_b, rb)):
            ctx = mod_ctx(MODS[li])
            top = ca[:, 1, li, :]                 # (T, d) row-1 polys
            tabs_l = [t[li] for t in fwd]
            if i8:
                c1_ntt = _fwd_tiled(tb, d, top, tabs_l)
                f_dig = _fwd_tiled_i8(tb, d, rows8, tabs_l)
            else:
                x = jnp.concatenate([top, rows], axis=0)
                f = _fwd_tiled(tb, d, x, tabs_l)
                c1_ntt = f[:T]                    # (T, d)
                f_dig = f[T:]
            dig = f_dig.reshape(m, T * d)         # rows k, lanes (t, d)
            W_l = w_ref[:, :, li, :]              # (base, m, d)
            # _matmul_limb_2d broadcasts W over the T output columns
            # per chunk (lane axes: W d, digits (t, d))
            prod = _matmul_limb_2d(W_l, dig, ctx).reshape(base, T, d)
            if bias:
                # undo the digit bias after the matmul (linearity):
                # + bias*NTT(ones) ⊙ Σ_k W[:, k], broadcast over T
                prod = ctx.add(prod, corr_ref[:, li, :][:, None, :])
            out_l = ctx.add(cv[:, :, li, :], jnp.swapaxes(prod, 0, 1))
            bottom = ctx.add(out_l[:, base - 1], c1_ntt)
            planes.append(jnp.concatenate(
                [out_l[:, :base - 1], bottom[:, None]], axis=1))
        out_ref[...] = jnp.stack(planes, axis=-2)  # (T, base, 2, d)

    return kernel


import os as _os

_KS_BUDGET = int(_os.environ.get("SPIRAL_KS_BUDGET", "896"))


def _ks_tile(m: int) -> int:
    """Cts per K2 grid step, sized so the digit working set stays inside
    the kernel's scoped-VMEM limit: the dominant live tensors scale with
    the T*m digit rows (~0.1 MB/row at d=2048 across the i8 digits, the
    u32 NTT output and the matmul half-splits), so cap T*m at the
    budget (the forward NTT itself tiles internally at 128 rows).
    Larger steps amortize per-step serial latency; prefer multiples of 8
    so tensors fill whole sublane tiles.  T itself is also capped at 32:
    the key-switch matmul broadcasts its W operand over T*d lanes per
    term, and the live broadcast temporaries scale with T (measured:
    m=16 with T=56 overflowed the 100 MB scoped limit despite fitting
    the row budget; T=32 compiles for every production m).  r5: row-cap
    896 is what lifts the wide m_exp_right=56 gadget from T=5 to 16."""
    t = min(32, max(1, _KS_BUDGET // m))
    return t if t < 8 else (t // 8) * 8


def w_bias_corr(W, m: int, bias: int):
    """corr[b, li, z] = bias * NTT(ones)[li, z] * Σ_k W[b, k, li, z]
    (mod p_li) — the matmul-level bias undo, computed in XLA from the
    (tiny) key-switch matrix.  Callers compute it once per (round, W)
    and pass it into the kernel call (ADVICE r4: don't re-derive it per
    run() invocation)."""
    from ..arith.mod import mod_ctx as _mc
    from ..arith.ntt_pallas import _bias_row
    d = W.shape[-1]
    outs = []
    for li, p in enumerate((P_I, B_I)):
        ctx = _mc(p)
        s = jnp.zeros_like(W[:, 0, li, :])
        for k in range(m):
            s = s + W[:, k, li, :]
            if k % 14 == 13:                       # 15 * 2^28 < 2^32
                s = ctx.reduce_u32(s)
        s = ctx.reduce_u32(s)
        C = jnp.asarray(_bias_row(p, d, bias))
        outs.append(ctx.mul(s, C[None, :]))
    return jnp.stack(outs, axis=-2)                # (base, 2, d)


@lru_cache(maxsize=None)
def _keyswitch_call(N: int, m: int, base: int, d: int, interpret: bool):
    T = min(_ks_tile(m), N)
    grid = (N + T - 1) // T
    kernel = _make_keyswitch_kernel(m, base, d, T)
    fwd, _ = _fold_tables(d)
    _, bias = _ks_i8_bias(m)
    extra_specs = []
    if bias:
        extra_specs.append(pl.BlockSpec((base, 2, d), lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM))

    table_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in fwd
    ]

    def run(cv, c_auto, W, corr=None):
        # cv/c_auto: (N, base, 2, d); W: (base, m, 2, d)
        pad = grid * T - N
        if pad:
            z = jnp.zeros((pad, base, 2, d), dtype=jnp.uint32)
            cv = jnp.concatenate([cv, z], axis=0)
            c_auto = jnp.concatenate([c_auto, z], axis=0)
        if bias and corr is None:
            corr = w_bias_corr(W, m, bias)
        extra = [corr] if bias else []
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(cv.shape, jnp.uint32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((T, base, 2, d), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, base, 2, d), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((base, m, 2, d), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs + extra_specs,
            out_specs=pl.BlockSpec((T, base, 2, d), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(cv, c_auto, W, *[jnp.asarray(t) for t in fwd], *extra)
        return out[:N] if pad else out

    return run


def keyswitch_fused(cv, c_auto, W, m: int, interpret: bool, corr=None):
    """cv: (N, base, 1, 2, d) NTT; c_auto: same shape, coeff domain
    (already automorphed); W: (base, m, 2, d) NTT.
    Returns cv + KeySwitch_W(c_auto) with the row-1 poly added to the
    bottom row (server/expand.py _keyswitch_batch semantics).
    corr: precomputed w_bias_corr(W, m, bias) (computed here if None)."""
    N, base = cv.shape[0], cv.shape[1]
    d = cv.shape[-1]
    run = _keyswitch_call(N, m, base, d, interpret)
    out = run(cv.reshape(N, base, 2, d), c_auto.reshape(N, base, 2, d), W,
              corr)
    return out.reshape(cv.shape)
