"""Gadget matrices and digit decomposition.

Covers the reference's buildGadget / gadget_invert (ref: src/util.cpp:89-150)
and the signed-digit-with-carry variant used by the folding external product
(ref: src/spiral.cpp:270-341 split_and_crt).  Digits are extracted from the
transient 56-bit Garner lift of the residue pair; every digit fits a u32
lane (digit width <= 29 bits).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..params import LOG_Q, Q, get_bits_per
from ..arith.crt import lift_pair, const_residues
from ..arith.mod import mod_ctx
from ..arith.u32 import shr_pair
from .poly import MODS, PolyMat


@lru_cache(maxsize=None)
def _build_gadget_np(rows: int, cols: int, d: int) -> np.ndarray:
    assert cols % rows == 0
    num_elems = cols // rows
    bits_per = get_bits_per(num_elems)
    data = np.zeros((rows, cols, 2, d), dtype=np.uint32)
    for i in range(rows):
        for j in range(num_elems):
            if bits_per * j >= 64:
                continue
            x, y = const_residues(1 << (bits_per * j))
            data[i, i + j * rows, 0, 0] = x
            data[i, i + j * rows, 1, 0] = y
    return data


def build_gadget(rows: int, cols: int, d: int) -> PolyMat:
    """G: block pattern G[i][i + j*rows] = z^j, z = 2^bits_per
    (ref: src/util.cpp:89-106).  The cache holds host numpy (a cached
    device array created inside a jit trace would leak tracers)."""
    return PolyMat(_build_gadget_np(rows, cols, d), ntt=False)


def _digits_unsigned(hi, lo, num_elems: int, bits_per: int):
    """List of digit arrays (u32, < 2^bits_per) of the 56-bit pair value."""
    mask = jnp.uint32((1 << bits_per) - 1) if bits_per < 32 else jnp.uint32(
        0xFFFFFFFF)
    out = []
    for k in range(num_elems):
        off = k * bits_per
        assert off < 64
        _, piece = shr_pair(hi, lo, off)
        out.append(piece & mask)
    return out


def _digit_to_residues(piece, bits_per: int):
    """u32 digit -> canonical residue pair, stacked on axis -2.

    Digits are < 2^bits_per; when that's below both moduli (bits_per < 28)
    the digit IS its own residue — no reduction needed."""
    if bits_per < 28:
        return jnp.stack([piece, piece], axis=-2)
    return jnp.stack(
        [mod_ctx(p).reduce_u32(piece) for p in MODS], axis=-2)


import functools
import jax


def gadget_invert_impl(x, mx: int, rdim: int):
    """Unsigned base-z digit decomposition (ref: src/util.cpp:114-144).

    x: coeff-domain residues (..., rdim, m, 2, d) -> (..., mx, m, 2, d) with
    out[j + k*rdim] = digit_k(x[j]).

    Unjitted implementation: also traced INSIDE the fused expansion
    Pallas kernel (server/expand_pallas.py).
    """
    assert x.shape[-4] == rdim and mx % rdim == 0
    num_elems = mx // rdim
    bits_per = get_bits_per(num_elems)
    hi, lo = lift_pair(x[..., 0, :], x[..., 1, :])  # (..., rdim, m, d)
    digs = _digits_unsigned(hi, lo, num_elems, bits_per)
    # rows ordered k-major blocks of rdim: row j + k*rdim
    rows = jnp.concatenate(
        [_digit_to_residues(dg, bits_per) for dg in digs], axis=-4)
    return rows


gadget_invert_raw = functools.partial(
    jax.jit, static_argnames=("mx", "rdim"))(gadget_invert_impl)


def gadget_invert(x: PolyMat, mx: int, rdim: int | None = None) -> PolyMat:
    rdim = x.rows if rdim is None else rdim
    return PolyMat(gadget_invert_raw(x.data, mx, rdim), ntt=False)


def gadget_invert_signed_impl(x, num_elems: int, rdim: int):
    """Signed digits with carry, matching split_and_crt's two-half chains
    (ref: src/spiral.cpp:283-332).

    First half k in [0, ne//2): carry chain, digit signed when
    piece > z/2 and k < ne//2 - 1.  Second half k in [ne//2, ne): fresh
    carry chain, digit signed (incl. the last; final carry dropped).

    Unjitted implementation: also traced INSIDE the fused fold Pallas
    kernel (server/fold_pallas.py), where a pjit call couldn't lower.
    """
    bits_per = get_bits_per(num_elems)
    z = 1 << bits_per
    half_z = jnp.uint32(z // 2)
    hi, lo = lift_pair(x[..., 0, :], x[..., 1, :])
    digs = _digits_unsigned(hi, lo, num_elems, bits_per)

    # (Q - z) residues for the signed correction
    corr = [jnp.uint32((Q - z) % p) for p in MODS]

    out_rows = [None] * num_elems
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
            small = bits_per + 1 < 28  # piece <= z + 1 < both moduli
            limbs = []
            for li, p in enumerate(MODS):
                ctx = mod_ctx(p)
                r = piece if small else ctx.reduce_u32(piece)
                limbs.append(jnp.where(do_sign, ctx.add(r, corr[li]), r))
            out_rows[k] = jnp.stack(limbs, axis=-2)
    # row layout j + k*rdim over the input's rdim axis
    return jnp.concatenate(out_rows, axis=-4)


gadget_invert_signed_raw = functools.partial(
    jax.jit, static_argnames=("num_elems", "rdim"))(
        gadget_invert_signed_impl)


def gadget_invert_signed(x: PolyMat, num_elems: int) -> PolyMat:
    return PolyMat(
        gadget_invert_signed_raw(x.data, num_elems, x.rows), ntt=False)
