"""Fused fold-round Pallas mega-kernel.

One GSW fold round (ref: src/spiral.cpp:1349-1410 foldOneFurtherDimension
+ split_and_crt + cpu_mul_query_by_ct) is a chain of five tensor ops in
the unfused path (server/fold.py): signed gadget decomposition, forward
NTT of the digit tensor, two external-product matmuls, add, inverse NTT.
The digit tensor is t_gsw times larger than the ciphertexts (round 0 at
the paper's 2^20 x 256 B shape: ~113 MB), so the unfused chain pays four
HBM round trips over it.  This kernel keeps the digits entirely in VMEM:

  grid = (m_out, 2); step (i, s) processes source ct 2i+s
    1. signed gadget decomposition (core/gadget.py impl, traced in-kernel)
    2. forward NTT of the m2*n2 digit polys (arith/ntt_pallas bodies)
    3. external-product matmul against q_neg (s=0) / q_pos (s=1)
    4. accumulate into a VMEM scratch across the two sources
    5. on s=1: inverse NTT of the n1*n2 sums -> output ct i

Only the (small) ciphertext tensors ever touch HBM; per-round traffic
drops from ~4x the digit tensor to ~1.5x the ct tensor.  Valid only when
the process NTT engine is the Pallas four-step engine (the query's
NTT-domain slot order must match the in-kernel transform); the fold.py
dispatcher enforces that.

Bit-identical to the unfused path (tests/test_fold_pallas.py): the digit
math and matmul reuse the same u32 building blocks.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import B_I, P_I, Params
from ..arith.mod import mod_ctx
from ..arith.ntt_pallas import (D1, D2, _fwd_body, _inv_body, _tables)

MODS = (P_I, B_I)


def _matmul_limb_2d(A, B, ctx):
    """Single-limb NTT-domain contraction, traced in-kernel.

    A: (R, M, L), B: (M, L) -> (R, L), out[r] = sum_k A[r,k]*B[k] mod p.
    L is a flattened (cols, d) lane axis so every tensor fills all 8
    sublanes (a (..., 2, d) residue layout would waste 3/4 of the VPU).
    Same 14-bit half-product scheme as core.poly.matmul_raw; partial
    sums run in int32 (Mosaic has no unsigned reductions) with chunk=8
    keeping 8*(2^14-1)^2 < 2^31.  The operands are sliced and half-split
    PER CHUNK — splitting A/B up front quadruples their VMEM liveness
    and blows the scoped-vmem budget at production shapes."""
    M = A.shape[-2]
    # A's lane axis may be just d while B's is L = rep*d (a q/W operand
    # shared by every output column): the replication happens on the
    # per-term slice, never materializing the full broadcast
    R, L, dA = A.shape[0], B.shape[-1], A.shape[-1]
    rep = L // dA
    chunk = 16
    A0, A1 = A & jnp.uint32(0x3FFF), A >> 14
    B0, B1 = B & jnp.uint32(0x3FFF), B >> 14
    p = ctx.p
    w14, w28 = (1 << 14) % p, (1 << 28) % p
    ws14 = jnp.uint32((w14 << 32) // p)
    ws28 = jnp.uint32((w28 << 32) // p)
    w14 = jnp.uint32(w14)
    w28 = jnp.uint32(w28)

    def term_rep(X, k):
        t = jax.lax.slice_in_dim(X, k, k + 1, axis=1)   # (R, 1, dA)
        if rep > 1:
            t = jnp.broadcast_to(t, (R, rep, dA))
        return t.reshape(R, L)

    acc = None
    n_lazy = 0
    for ci, start in enumerate(range(0, M, chunk)):
        end = min(start + chunk, M)
        # Sequential multiply-accumulate over the contraction terms: a
        # vectorized jnp.sum over a (R, chunk, L) product tensor reduces
        # across SUBLANES, which Mosaic lowers as slow shuffle chains
        # (measured: it dominated the whole fold kernel).  Elementwise
        # u32 FMAs are exact: chunk=16 keeps 16*(2^14-1)^2 < 2^32.
        c00 = c01 = c10 = c11 = None
        for k in range(start, end):
            a0, a1 = term_rep(A0, k), term_rep(A1, k)
            b0 = jax.lax.slice_in_dim(B0, k, k + 1, axis=0)
            b1 = jax.lax.slice_in_dim(B1, k, k + 1, axis=0)
            if c00 is None:
                c00, c01 = a0 * b0, a0 * b1
                c10, c11 = a1 * b0, a1 * b1
            else:
                c00, c01 = c00 + a0 * b0, c01 + a0 * b1
                c10, c11 = c10 + a1 * b0, c11 + a1 * b1
        # Lazy chunk recombination: Shoup-multiply the UNREDUCED c01/c10/
        # c11 accumulators (Shoup r = w*y - floor(y*ws/2^32)*p < 2p holds
        # for any u32 y, then one subtract -> < p), reduce only c00, and
        # defer the final reduction of the <4p chunk sums: up to 7 chunk
        # sums (28p < 2^32) accumulate before a Solinas fold closes them.
        term = (ctx.reduce_u32(c00) +
                ctx.mul_shoup(c01, w14, ws14) +
                ctx.mul_shoup(c10, w14, ws14) +
                ctx.mul_shoup(c11, w28, ws28))        # < 4p
        if acc is None:
            acc, n_lazy = term, 4
        elif n_lazy + 4 <= 15:
            acc, n_lazy = acc + term, n_lazy + 4
        else:
            acc, n_lazy = ctx.reduce_u32(acc) + term, 5
    return ctx.reduce_u32(acc)


def _matmul_pair(a, b):
    """NTT-domain matmul on residue pairs, traced in-kernel.

    a: (R, M, 2, d), b: (M, C, 2, d) -> (R, C, 2, d): a thin wrapper
    around _matmul_limb_2d with the (C, d) axes flattened into lanes."""
    R, M = a.shape[0], a.shape[1]
    C, d = b.shape[1], b.shape[-1]
    outs = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        A = jnp.broadcast_to(a[:, :, li, :][:, :, None, :],
                             (R, M, C, d)).reshape(R, M, C * d)
        B = b[..., li, :].reshape(M, C * d)
        outs.append(_matmul_limb_2d(A, B, ctx).reshape(R, C, d))
    return jnp.stack(outs, axis=-2)


def _add_pair(a, b):
    outs = []
    for li, p in enumerate(MODS):
        outs.append(mod_ctx(p).add(a[..., li, :], b[..., li, :]))
    return jnp.stack(outs, axis=-2)


def _signed_digit_rows_2d(x_p, x_b, num_elems: int):
    """2D in-kernel signed gadget: x_p/x_b (P, d) canonical residues of
    the SAME values -> per-limb digit-row tensors [(num_elems*P, d)] x 2,
    rows ordered k-major (digit k's block of P rows at k*P).

    Exactly core.gadget.gadget_invert_signed_impl's math, restated on
    flat (rows, d) planes so every elementwise op fills all 8 sublanes
    (the (..., 2, d) residue layout wastes 3/4 of the VPU in-kernel)."""
    from ..params import Q, get_bits_per
    from ..arith.crt import lift_pair
    from ..arith.u32 import shr_pair

    bits_per = get_bits_per(num_elems)
    assert (num_elems - 1) * bits_per < 64, (num_elems, bits_per)
    z = 1 << bits_per
    half_z = jnp.uint32(z // 2)
    hi, lo = lift_pair(x_p, x_b)
    mask = jnp.uint32((1 << bits_per) - 1) if bits_per < 32 else \
        jnp.uint32(0xFFFFFFFF)
    digs = []
    for k in range(num_elems):
        _, piece = shr_pair(hi, lo, k * bits_per)
        digs.append(piece & mask)

    corr = [jnp.uint32((Q - z) % p) for p in MODS]
    rows = [[None] * num_elems, [None] * num_elems]
    small = bits_per + 1 < 28
    for half in (0, 1):
        ks = range(0, num_elems // 2) if half == 0 else range(
            num_elems // 2, num_elems)
        carry = jnp.zeros_like(digs[0])
        for k in ks:
            piece = digs[k] + carry
            if half == 0:
                do_sign = (piece > half_z) & (k < num_elems // 2 - 1)
            else:
                do_sign = piece > half_z
            carry = do_sign.astype(jnp.uint32)
            for li, p in enumerate(MODS):
                ctx = mod_ctx(p)
                r = piece if small else ctx.reduce_u32(piece)
                rows[li][k] = jnp.where(do_sign, ctx.add(r, corr[li]), r)
    return (jnp.concatenate(rows[0], axis=0),
            jnp.concatenate(rows[1], axis=0))


def _fwd_tiled(tb, d, rows, tabs, max_rows: int = 128):
    """_fwd_body over static sub-tiles so the int32 NTT intermediates
    ((rows, 16, 512) per stage) stay a few MB regardless of batch."""
    n = rows.shape[0]
    if n <= max_rows:
        return _fwd_body(tb, d, rows, *tabs)
    outs = []
    for start in range(0, n, max_rows):
        end = min(start + max_rows, n)
        outs.append(_fwd_body(
            tb, d, jax.lax.slice_in_dim(rows, start, end, axis=0), *tabs))
    return jnp.concatenate(outs, axis=0)


def _fwd_tiled_i8(tb, d, rows_i8, tabs, max_rows: int = 128):
    """_fwd_body_i8 over static sub-tiles (same bound as _fwd_tiled)."""
    from ..arith.ntt_pallas import _fwd_body_i8
    n = rows_i8.shape[0]
    if n <= max_rows:
        return _fwd_body_i8(tb, d, rows_i8, *tabs)
    outs = []
    for start in range(0, n, max_rows):
        end = min(start + max_rows, n)
        outs.append(_fwd_body_i8(
            tb, d, jax.lax.slice_in_dim(rows_i8, start, end, axis=0),
            *tabs))
    return jnp.concatenate(outs, axis=0)


FOLD_I8_BIAS = 64


def _signed_digit_rows_i8(x_p, x_b, num_elems: int):
    """Signed gadget digits as ONE int8 tensor shared by both CRT limbs:
    x_p/x_b (P, d) canonical residues -> (num_elems*P, d) int8, rows
    k-major, entry = signed digit - FOLD_I8_BIAS.  Valid for
    bits_per <= 7: signed digits lie in [-z/2+1, z/2] EXCEPT the
    half-boundary digit k = num_elems//2 - 1 (never sign-corrected, up
    to +z = 128, one past int8); the uniform -64 bias maps every case
    into [-127, 64].  The caller undoes the bias AFTER the external-
    product matmul by adding bias * NTT(ones) ⊙ Σ_k q[:, k] (NTT and
    matmul linearity) — see fold_rounds_fused.  Digit/carry math is
    exactly _signed_digit_rows_2d's."""
    from ..params import get_bits_per
    from ..arith.crt import lift_pair
    from ..arith.u32 import shr_pair

    bits_per = get_bits_per(num_elems)
    assert bits_per <= 7, bits_per
    # highest digit shift is (num_elems-1)*bits_per; shr_pair needs < 64
    assert (num_elems - 1) * bits_per < 64, (num_elems, bits_per)
    z = 1 << bits_per
    half_z = jnp.uint32(z // 2)
    hi, lo = lift_pair(x_p, x_b)
    mask = jnp.uint32((1 << bits_per) - 1)
    digs = []
    for k in range(num_elems):
        _, piece = shr_pair(hi, lo, k * bits_per)
        digs.append(piece & mask)

    rows = [None] * num_elems
    for half in (0, 1):
        ks = range(0, num_elems // 2) if half == 0 else range(
            num_elems // 2, num_elems)
        carry = jnp.zeros_like(digs[0])
        for k in ks:
            piece = digs[k] + carry
            if half == 0:
                do_sign = (piece > half_z) & (k < num_elems // 2 - 1)
            else:
                do_sign = piece > half_z
            carry = do_sign.astype(jnp.uint32)
            rows[k] = (piece.astype(jnp.int32) -
                       jnp.int32(z) * carry.astype(jnp.int32) -
                       jnp.int32(FOLD_I8_BIAS)).astype(jnp.int8)
    return jnp.concatenate(rows, axis=0)


def _fold_digit_mode(num_elems: int, signed: bool) -> tuple[str, int]:
    """(digit kind, int8 bias) for a fold-kernel instantiation.

    signed: the Spiral GSW external product (split_and_crt digits).
    unsigned: the Pack fold's plain base-z digits (ref:
    src/testing.cpp:596-624 uses gadget_invert, not split_and_crt)."""
    from ..params import get_bits_per
    bits = get_bits_per(num_elems)
    if signed:
        return ("i8s", FOLD_I8_BIAS) if bits <= 7 else ("2ds", 0)
    if bits <= 7:
        return "i8u", 0          # unsigned 7-bit digits are int8 as-is
    if bits == 8:
        return "i8u", 128        # recentre 8-bit digits (bias undo after)
    return "2du", 0


def _make_fold_kernel(t_gsw: int, n1: int, n2: int, d: int, TC: int,
                      signed: bool = True):
    """One grid step folds TC adjacent ct PAIRS (both mux sources) into
    TC output cts.  Fewer, larger steps amortize the per-step serial
    latency (a 1-pair-1-source step measured ~180 us fixed cost on v5e,
    swamping its ~15 us of arithmetic).

    signed=False instantiates the Pack-fold variant: n1=2/n2=1 cts,
    UNSIGNED gadget digits (per-row width t_gsw), same external-product
    structure."""
    tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)
    m2 = t_gsw * n1
    P = n1 * n2
    L = n2 * d
    # bits_per <= 7 (production t_gsw >= 9): signed digits fit int8, so
    # ONE digit tensor serves both CRT limbs and the forward NTT's first
    # matmul contracts a single signed limb instead of four 7-bit planes
    kind, bias = _fold_digit_mode(t_gsw, signed)
    i8_digits = kind in ("i8s", "i8u")
    has_corr = bias > 0

    def digit_rows(v):
        """(P', 2, d) residue rows -> digit rows for one mux source."""
        if kind == "i8s":
            return _signed_digit_rows_i8(v[:, 0, :], v[:, 1, :], t_gsw)
        if kind == "i8u":
            from .expand_pallas import _unsigned_digit_rows_i8
            return _unsigned_digit_rows_i8(v[:, 0, :], v[:, 1, :], t_gsw,
                                           bias)
        if kind == "2ds":
            return _signed_digit_rows_2d(v[:, 0, :], v[:, 1, :], t_gsw)
        from .expand_pallas import _unsigned_digit_rows_2d
        return _unsigned_digit_rows_2d(v[:, 0, :], v[:, 1, :], t_gsw)

    def kernel(cts_ref, q_ref, f1, f2, f3, f4, i1, i2, i3, i4, *rest):
        out_ref = rest[-1]
        corr_ref = rest[0] if has_corr else None
        ct = cts_ref[...]                 # (TC, 2, n1, n2, 2, d)
        fwd = (f1, f2, f3, f4)
        inv = (i1, i2, i3, i4)
        # Reorder each mux source to (j, tc, c) row order BEFORE the
        # digit decomposition: digit rows concatenated k-major then land
        # directly in (k*n1+j, (tc, c, d)) matmul layout, so the (large)
        # NTT output needs NO in-kernel relayout — a 5D transpose of the
        # digit tensor was the dominant per-step cost in the previous
        # revision.  The reorder itself touches only the small ct block.
        rows_s = []                       # [s] -> digit rows (see above)
        for s in range(2):
            v = jnp.transpose(ct[:, s], (1, 0, 2, 3, 4)).reshape(
                n1 * TC * n2, 2, d)
            rows_s.append(digit_rows(v))
        outs = []
        for li, tb in ((0, tb_p), (1, tb_b)):
            ctx = mod_ctx(MODS[li])
            acc = None
            for s in range(2):
                if i8_digits:
                    g = _fwd_tiled_i8(tb, d, rows_s[s],
                                      [t[li] for t in fwd])
                else:
                    g = _fwd_tiled(tb, d, rows_s[s][li],
                                   [t[li] for t in fwd])
                B = g.reshape(m2, TC * L)  # rows k*n1+j, lanes (tc,c,d)
                q_l = q_ref[s, :, :, li, :]           # (n1, m2, d)
                p_s = _matmul_limb_2d(q_l, B, ctx)    # (n1, TC*L)
                acc = p_s if acc is None else ctx.add(acc, p_s)
            t4 = acc.reshape(n1, TC, n2, d)
            if has_corr:
                # undo the digit bias: + bias*NTT(ones) ⊙ Σ_{s,k} q[s,:,k]
                # (precomputed per round outside the kernel), broadcast
                # over the (tc, c) output columns
                t4 = ctx.add(t4, corr_ref[:, li, :][:, None, None, :])
            y = _inv_body(tb, d,
                          jnp.transpose(t4, (1, 0, 2, 3)).reshape(
                              TC * P, d), *[t[li] for t in inv])
            outs.append(y.reshape(TC, n1, n2, d))
        out_ref[...] = jnp.stack(outs, axis=-2)       # (TC, n1, n2, 2, d)

    return kernel


@lru_cache(maxsize=None)
def _fold_tables(d: int):
    """Limb-stacked NTT tables (device arrays built lazily per process)."""
    import numpy as np
    tp, tb = _tables(P_I, d), _tables(B_I, d)
    fwd = (np.stack([tp.m1fT, tb.m1fT]), np.stack([tp.tf, tb.tf]),
           np.stack([tp.tf_shoup, tb.tf_shoup]), np.stack([tp.w2f, tb.w2f]))
    inv = (np.stack([tp.m1i, tb.m1i]), np.stack([tp.ti, tb.ti]),
           np.stack([tp.ti_shoup, tb.ti_shoup]), np.stack([tp.m2iT, tb.m2iT]))
    return fwd, inv


import os

_FOLD_TC = int(os.environ.get("SPIRAL_FOLD_TC", "1"))


@lru_cache(maxsize=None)
def _fold_round_call(m_out: int, t_gsw: int, n1: int, n2: int, d: int,
                     interpret: bool, signed: bool = True,
                     tc: int | None = None):
    m2 = t_gsw * n1
    TC = min(_FOLD_TC if tc is None else tc, m_out)
    kernel = _make_fold_kernel(t_gsw, n1, n2, d, TC, signed)
    _, bias = _fold_digit_mode(t_gsw, signed)
    has_corr = bias > 0
    fwd, inv = _fold_tables(d)
    tabs = fwd + inv
    table_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tabs
    ]
    extra_specs = []
    if has_corr:
        extra_specs.append(pl.BlockSpec((n1, 2, d), lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM))

    def run(cts_pairs, q_cat, corr=None):
        extra = [corr] if has_corr else []
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m_out, n1, n2, 2, d),
                                           jnp.uint32),
            grid=(m_out // TC,),
            in_specs=[
                pl.BlockSpec((TC, 2, n1, n2, 2, d),
                             lambda i: (i, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n1, m2, 2, d),
                             lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs + extra_specs,
            out_specs=pl.BlockSpec((TC, n1, n2, 2, d),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the default 16 MB scoped-vmem budget is conservative;
                # raise it so the digit/NTT working set fits without
                # forcing tiny tiles (v5e has headroom above the default)
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(cts_pairs, q_cat, *[jnp.asarray(t) for t in tabs], *extra)

    return run


def _fold_bias_corr(qp_r, qn_r, bias: int = FOLD_I8_BIAS):
    """Per-round bias correction for the int8 digit paths:
    corr[j, li, z] = bias * NTT(ones)[li, z] * Σ_{s,k} q_s[j,k,li,z]
    (mod p_li).  qp_r/qn_r: (n1, m2, 2, d) NTT residues; returns
    (n1, 2, d) u32.  Runs in XLA outside the kernel (tiny tensors)."""
    from ..arith.ntt_pallas import _bias_row
    d = qp_r.shape[-1]
    outs = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        both = jnp.concatenate([qp_r[:, :, li, :], qn_r[:, :, li, :]],
                               axis=1)             # (n1, 2*m2, d)
        s = jnp.zeros_like(both[:, 0])
        for k in range(both.shape[1]):
            s = s + both[:, k]
            if k % 14 == 13:                       # 15 * (2^28) < 2^32
                s = ctx.reduce_u32(s)
        s = ctx.reduce_u32(s)
        C = jnp.asarray(_bias_row(p, d, bias))
        outs.append(ctx.mul(s, C[None, :]))
    return jnp.stack(outs, axis=-2)                # (n1, 2, d)


def fold_fused_supported(params: Params) -> bool:
    """The kernel requires the Pallas NTT engine's slot order (the query
    tensors are NTT-domain) and the engine's fixed ring degree."""
    from ..arith.ntt import ntt_engine_name
    return (params.poly_len == D1 * D2 and
            ntt_engine_name(params.poly_len) == "pallas")


def fold_rounds_fused(cts_coeff, q_pos, q_neg, params: Params,
                      start_round: int = 0, num_rounds: int | None = None,
                      interpret: bool | None = None):
    """Drop-in replacement for fold.fold_rounds via the fused kernel.

    cts_coeff: (m, n1, n2, 2, d) coeff domain, bit-reversed row order
    (round s pairs adjacent rows 2k/2k+1 — see server/fold.py)."""
    from ..params import get_bits_per
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = cts_coeff.shape[0]
    total = m.bit_length() - 1
    rounds = total if num_rounds is None else num_rounds
    p = params
    i8 = get_bits_per(p.t_gsw) <= 7
    for r in range(start_round, start_round + rounds):
        m //= 2
        cts_pairs = cts_coeff.reshape((m, 2) + cts_coeff.shape[1:])
        q_cat = jnp.stack([q_neg[r], q_pos[r]])
        run = _fold_round_call(m, p.t_gsw, p.n1, p.n2, p.poly_len,
                               interpret)
        corr = _fold_bias_corr(q_pos[r], q_neg[r]) if i8 else None
        cts_coeff = run(cts_pairs, q_cat, corr)
    return cts_coeff


def _make_fold_kernel_batch(t_gsw: int, n1: int, n2: int, d: int, TC: int,
                            signed: bool = True):
    """Batch variant: q/corr arrive with a leading per-query block dim
    (their BlockSpecs index by grid position // steps-per-query)."""
    base = _make_fold_kernel(t_gsw, n1, n2, d, TC, signed)
    _, bias = _fold_digit_mode(t_gsw, signed)

    def kernel(cts_ref, q_ref, f1, f2, f3, f4, i1, i2, i3, i4, *rest):
        class _Squeeze:
            def __init__(self, ref):
                self._ref = ref

            def __getitem__(self, idx):
                return self._ref[(0,) + (idx if isinstance(idx, tuple)
                                         else (idx,))]
        if bias > 0:
            corr_ref, out_ref = rest
            base(cts_ref, _Squeeze(q_ref), f1, f2, f3, f4, i1, i2, i3, i4,
                 _Squeeze(corr_ref), out_ref)
        else:
            base(cts_ref, _Squeeze(q_ref), f1, f2, f3, f4, i1, i2, i3, i4,
                 *rest)

    return kernel


@lru_cache(maxsize=None)
def _fold_round_call_batch(B: int, m_out: int, t_gsw: int, n1: int, n2: int,
                           d: int, interpret: bool, signed: bool = True,
                           tc: int | None = None):
    """One fold round over a BATCH of queries in one pallas_call: the
    grid runs over all B*m_out output cts; the q/corr operands are
    blocked per query (grid index // steps-per-query), so each query
    folds against its own GSW query tensors — the batched-serving analog
    of the single-query mega-kernel (no reference counterpart)."""
    m2 = t_gsw * n1
    TC = min(_FOLD_TC if tc is None else tc, m_out)
    spq = m_out // TC                     # grid steps per query
    kernel = _make_fold_kernel_batch(t_gsw, n1, n2, d, TC, signed)
    _, bias = _fold_digit_mode(t_gsw, signed)
    has_corr = bias > 0
    fwd, inv = _fold_tables(d)
    tabs = fwd + inv
    table_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in tabs
    ]
    extra_specs = []
    if has_corr:
        extra_specs.append(pl.BlockSpec(
            (1, n1, 2, d), lambda i: (i // spq, 0, 0, 0),
            memory_space=pltpu.VMEM))

    def run(cts_pairs, q_cat_b, corr_b=None):
        extra = [corr_b] if has_corr else []
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * m_out, n1, n2, 2, d),
                                           jnp.uint32),
            grid=(B * m_out // TC,),
            in_specs=[
                pl.BlockSpec((TC, 2, n1, n2, 2, d),
                             lambda i: (i, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, n1, m2, 2, d),
                             lambda i: (i // spq, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs + extra_specs,
            out_specs=pl.BlockSpec((TC, n1, n2, 2, d),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(cts_pairs, q_cat_b, *[jnp.asarray(t) for t in tabs], *extra)

    return run


def fold_rounds_fused_batch(cts_b, q_pos_b, q_neg_b, params: Params,
                            start_round: int = 0,
                            num_rounds: int | None = None,
                            interpret: bool | None = None):
    """Batched fold_rounds_fused: cts_b (B, m, n1, n2, 2, d) coeff,
    q_pos_b/q_neg_b (B, nu_2, n1, m2, 2, d) NTT.  Bit-identical to
    vmapping the unfused chain (tests)."""
    from ..params import get_bits_per
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, m = cts_b.shape[0], cts_b.shape[1]
    total = m.bit_length() - 1
    rounds = total if num_rounds is None else num_rounds
    p = params
    i8 = get_bits_per(p.t_gsw) <= 7
    for r in range(start_round, start_round + rounds):
        m //= 2
        pairs = cts_b.reshape((B * m, 2) + cts_b.shape[2:])
        q_cat_b = jnp.stack([q_neg_b[:, r], q_pos_b[:, r]], axis=1)
        corr_b = (jax.vmap(_fold_bias_corr)(q_pos_b[:, r], q_neg_b[:, r])
                  if i8 else None)
        run = _fold_round_call_batch(B, m, p.t_gsw, p.n1, p.n2,
                                     p.poly_len, interpret)
        out = run(pairs, q_cat_b, corr_b)
        cts_b = out.reshape((B, m) + out.shape[1:])
    return cts_b


_PACK_FOLD_TC = int(os.environ.get("SPIRAL_PACK_FOLD_TC", "8"))


def fold_pack_rounds_fused_batch(cts_b, q_pos_b, q_neg_b, params: Params,
                                 interpret: bool | None = None):
    """Batched fused pack fold: cts_b (B, T, m, 2, 1, 2, d) coeff;
    q_pos_b/q_neg_b (B, nu2, 2, 2*t_gsw, 2, d) NTT.  Each query's T*m/2
    pair-folds share that query's q blocks in the kernel grid (the same
    per-query BlockSpec indexing as fold_rounds_fused_batch)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = params
    B, T, m = cts_b.shape[0], cts_b.shape[1], cts_b.shape[2]
    total = m.bit_length() - 1
    kind, bias = _fold_digit_mode(p.t_gsw, signed=False)
    assert kind == "i8u", kind   # callers gate on int8 digit widths
    d = cts_b.shape[-1]
    for r in range(total):
        m //= 2
        pairs = cts_b.reshape(B * T * m, 2, 2, 1, 2, d)
        q_cat_b = jnp.stack([q_neg_b[:, r], q_pos_b[:, r]], axis=1)
        corr_b = (jax.vmap(lambda qp, qn: _fold_bias_corr(qp, qn, bias))(
            q_pos_b[:, r], q_neg_b[:, r]) if bias else None)
        run = _fold_round_call_batch(B, T * m, p.t_gsw, 2, 1, d,
                                     interpret, signed=False,
                                     tc=_PACK_FOLD_TC)
        out = run(pairs, q_cat_b, corr_b)
        cts_b = out.reshape(B, T, m, 2, 1, 2, d)
    return cts_b


def fold_pack_rounds_fused(cts_coeff, q_pos, q_neg, params: Params,
                           start_round: int = 0,
                           num_rounds: int | None = None,
                           interpret: bool | None = None):
    """Fused-kernel pack fold (pack.fold_pack_rounds semantics,
    bit-identical output): the trial axis folds into the kernel grid —
    every trial's pairs fold in the same pallas_call.

    cts_coeff: (T, m, 2, 1, 2, d) coeff, bit-reversed row order;
    q_pos/q_neg: (nu2, 2, 2*t_gsw, 2, d) NTT (UNSIGNED gadget — ref:
    src/testing.cpp:596-624)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = params
    T, m = cts_coeff.shape[0], cts_coeff.shape[1]
    total = m.bit_length() - 1
    rounds = total if num_rounds is None else num_rounds
    _, bias = _fold_digit_mode(p.t_gsw, signed=False)
    for r in range(start_round, start_round + rounds):
        m //= 2
        cts_pairs = cts_coeff.reshape(T * m, 2, 2, 1, 2, cts_coeff.shape[-1])
        q_cat = jnp.stack([q_neg[r], q_pos[r]])
        run = _fold_round_call(T * m, p.t_gsw, 2, 1, p.poly_len,
                               interpret, signed=False, tc=_PACK_FOLD_TC)
        corr = (_fold_bias_corr(q_pos[r], q_neg[r], bias)
                if bias else None)
        out = run(cts_pairs, q_cat, corr)
        cts_coeff = out.reshape(T, m, 2, 1, 2, cts_coeff.shape[-1])
    return cts_coeff


# ---------------------------------------------------------------------------
# MXU fold path: digits + forward NTT stay fused in a Pallas kernel, the
# external-product contraction runs as ONE batched int8 MXU GEMM in XLA
# over all NTT slots, with the (round-constant) query operand prescaled
# into (out-limb i, in-limb j) int8 planes — the same prescaled-limb trick
# the NTT tables use (arith/ntt_pallas._prescaled_imajor), applied to a
# per-slot-varying matrix by batching the GEMM over (crt limb, slot).
# Measured on v5e at the spiral_20_256 round-0 shape: the whole-round
# contraction drops from ~2.6 ms of in-kernel VPU MACs (_matmul_limb_2d)
# to ~50 us of MXU time (tools/bench_slotmm.py).
# Ref counterpart: src/spiral.cpp:464-582 cpu_mul_query_by_ct +
# 1349-1410 foldOneFurtherDimension.

def _make_fold_ntt_kernel(t_gsw: int, n1: int, n2: int, d: int, TC: int):
    """Digits + forward NTT of TC adjacent ct pairs; the NTT-domain digit
    tensor is written to HBM once (layout (li, s, k, tc, (jn1, c), d))
    for the XLA-side batched MXU contraction.  Rows feed the NTT in the
    natural (tc, jn1, c) input order — no in-kernel ct transpose."""
    from ..params import get_bits_per
    tb_p, tb_b = _tables(P_I, d), _tables(B_I, d)
    P = n1 * n2
    i8_digits = get_bits_per(t_gsw) <= 7

    def kernel(cts_ref, f1, f2, f3, f4, out_ref):
        ct = cts_ref[...]                 # (TC, 2, n1, n2, 2, d)
        fwd = (f1, f2, f3, f4)
        for s in range(2):
            v = ct[:, s].reshape(TC * P, 2, d)    # rows (tc, jn1, c)
            if i8_digits:
                rows8 = _signed_digit_rows_i8(v[:, 0, :], v[:, 1, :],
                                              t_gsw)
                for li, tb in ((0, tb_p), (1, tb_b)):
                    g = _fwd_tiled_i8(tb, d, rows8, [t[li] for t in fwd])
                    out_ref[li, s] = g.reshape(t_gsw, TC, P, d)
            else:
                rows = _signed_digit_rows_2d(v[:, 0, :], v[:, 1, :],
                                             t_gsw)
                for li, tb in ((0, tb_p), (1, tb_b)):
                    g = _fwd_tiled(tb, d, rows[li], [t[li] for t in fwd])
                    out_ref[li, s] = g.reshape(t_gsw, TC, P, d)

    return kernel


_FOLD_MXU_TC = int(os.environ.get("SPIRAL_FOLD_MXU_TC", "4"))


@lru_cache(maxsize=None)
def _fold_ntt_call(m_out: int, t_gsw: int, n1: int, n2: int, d: int,
                   interpret: bool):
    P = n1 * n2
    TC = min(_FOLD_MXU_TC, m_out)
    kernel = _make_fold_ntt_kernel(t_gsw, n1, n2, d, TC)
    fwd, _ = _fold_tables(d)
    table_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for t in fwd
    ]

    def run(cts_pairs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (2, 2, t_gsw, m_out, P, d), jnp.uint32),
            grid=(m_out // TC,),
            in_specs=[
                pl.BlockSpec((TC, 2, n1, n2, 2, d),
                             lambda i: (i, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + table_specs,
            out_specs=pl.BlockSpec((2, 2, t_gsw, TC, P, d),
                                   lambda i: (0, 0, 0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(cts_pairs, *[jnp.asarray(t) for t in fwd])

    return run


def _fold_qpre(q_cat, t_gsw: int, n1: int):
    """Prescale the round's query tensors for the batched MXU GEMM.

    q_cat: (2s, n1r, m2, 2, d) NTT-domain u32 ->
    (2li, 2s, t_gsw, n1jn1, 4j, 4i*n1r, d) int8 with entry
    [li, s, k, jn1, j, i*n1+r, z] = limb_i((2^{7j} * q_s[r, (k,jn1), z])
    mod p_li).  i is M-major so the recombination slices whole blocks
    (mirrors arith/ntt_pallas._prescaled_imajor)."""
    d = q_cat.shape[-1]
    outs = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        q = q_cat[..., li, :].reshape(2, n1, t_gsw, n1, d)  # (s,r,k,jn1,d)
        js = []
        for j in range(4):
            w = (1 << (7 * j)) % p
            qj = q if j == 0 else ctx.mul_shoup(
                q, jnp.uint32(w), jnp.uint32((w << 32) // p))
            iplanes = [((qj >> jnp.uint32(7 * i)) & jnp.uint32(0x7F)
                        ).astype(jnp.int8) for i in range(4)]
            js.append(jnp.stack(iplanes, axis=0))     # (4i, s, r, k, jn1, d)
        qp = jnp.stack(js, axis=0)                    # (4j, 4i, s, r, k, jn1, d)
        qp = qp.transpose(2, 4, 5, 0, 1, 3, 6)        # (s, k, jn1, j, i, r, d)
        outs.append(qp.reshape(2, t_gsw, n1, 4, 4 * n1, d))
    return jnp.stack(outs)                            # (2, s, k, jn1, j, 12, d)


def _fold_contract_mxu(G6, Qpre, corr, t_gsw: int, n1: int, n2: int):
    """Batched per-slot modular matmul + i-limb recombination.

    G6: (2li, 2s, t_gsw, m_out, n1*n2, d) u32 NTT digits;
    Qpre: output of _fold_qpre; corr: (n1, 2, d) bias undo or None.
    Returns (m_out, n1, n2, 2, d) u32 NTT-domain sums."""
    m_out, d = G6.shape[3], G6.shape[-1]
    G7 = G6.reshape(2, 2, t_gsw, m_out, n1, n2, d)
    # ONE relayout to batch-major (the GEMM batch dims (li, z) must be
    # major or XLA inserts far worse transposes around the dot), with the
    # j-limb split fused into the same pass
    Gt = G7.transpose(0, 6, 1, 2, 4, 3, 5)    # (li, d, s, k, jn1, mo, c)
    planes = [((Gt >> jnp.uint32(7 * j)) & jnp.uint32(0x7F)
               ).astype(jnp.int8) for j in range(4)]
    Gl = jnp.stack(planes, axis=5)       # (li, d, s, k, jn1, j, mo, c)
    Qt = Qpre.transpose(0, 6, 1, 2, 3, 4, 5)  # (li, d, s, k, jn1, j, 12)
    # contraction over (s, k, jn1, j): 2*t_gsw*n1*4 <= 2688 int8 terms,
    # products <= 127^2 -> int32-exact
    out = jax.lax.dot_general(
        Qt, Gl,
        dimension_numbers=(((2, 3, 4, 5), (2, 3, 4, 5)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)   # (li, d, 12, mo, c)
    res = []
    for li, p in enumerate(MODS):
        ctx = mod_ctx(p)
        o = out[li]                          # (d, 12, mo, c) i-major
        o0, o1, o2, o3 = (o[:, i * n1:(i + 1) * n1] for i in range(4))
        r01 = ctx.reduce_u32((o0 + (o1 << 7)).astype(jnp.uint32))
        r23 = ctx.reduce_u32((o2 + (o3 << 7)).astype(jnp.uint32))
        w = (1 << 14) % p
        r23 = ctx.mul_shoup(r23, jnp.uint32(w), jnp.uint32((w << 32) // p))
        v = ctx.add(r01, r23)                # (d, n1, mo, c)
        if corr is not None:
            c = jnp.swapaxes(corr[:, li, :], 0, 1)[:, :, None, None]
            v = ctx.add(v, jnp.broadcast_to(c, v.shape))
        res.append(v)
    v = jnp.stack(res)                       # (2, d, n1, mo, c)
    return v.transpose(3, 2, 4, 0, 1)        # (mo, n1, c, 2, d)


def fold_rounds_mxu(cts_coeff, q_pos, q_neg, params: Params,
                    start_round: int = 0, num_rounds: int | None = None,
                    interpret: bool | None = None):
    """fold.fold_rounds via the MXU contraction path (same signature and
    bit-identical output as fold_rounds_fused)."""
    from ..params import get_bits_per
    from ..arith.ntt_pallas import crt_ntt_pallas
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # the digit NTT runs with the Pallas bodies, so the closing inverse
    # must be the Pallas engine (slot orders differ between engines)
    eng = crt_ntt_pallas(params.poly_len)
    m = cts_coeff.shape[0]
    total = m.bit_length() - 1
    rounds = total if num_rounds is None else num_rounds
    p = params
    i8 = get_bits_per(p.t_gsw) <= 7
    for r in range(start_round, start_round + rounds):
        m //= 2
        cts_pairs = cts_coeff.reshape((m, 2) + cts_coeff.shape[1:])
        q_cat = jnp.stack([q_neg[r], q_pos[r]])
        G6 = _fold_ntt_call(m, p.t_gsw, p.n1, p.n2, p.poly_len,
                            interpret)(cts_pairs)
        Qpre = _fold_qpre(q_cat, p.t_gsw, p.n1)
        corr = _fold_bias_corr(q_pos[r], q_neg[r]) if i8 else None
        v = _fold_contract_mxu(G6, Qpre, corr, p.t_gsw, p.n1, p.n2)
        cts_coeff = eng.inverse(v)
    return cts_coeff
