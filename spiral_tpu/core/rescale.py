"""Modulus switching / rescaling and response bit-packing.

Host-side exact-integer implementations of the reference's rescale
(ref: src/poly.cpp:578-601), the two-modulus response encoding
(ref: src/spiral.cpp:1439-1447), and arbitrary-bit packing
(ref: src/core.cpp:20-52).  These touch only n1*n2*d coefficients per
query, so python-int numpy is plenty; the streaming server path never
calls them per-database-element.
"""
from __future__ import annotations

import numpy as np

from ..params import Q


def rescale_array(v: np.ndarray, in_mod: int, out_mod: int) -> np.ndarray:
    """Centered rounded rescale of canonical values (object/int array)."""
    v = np.asarray(v, dtype=object) % in_mod
    centered = np.where(v >= in_mod // 2, v - in_mod, v)
    sign = np.where(centered >= 0, 1, -1)
    num = centered * out_mod + sign * (in_mod // 2)
    result = num // in_mod + np.where((num % in_mod != 0) & (sign < 0), 1, 0)
    # match C++ truncation-toward-zero division for negatives
    return (result % out_mod).astype(object)


def rescale_residues_device(x_p, x_b, out_mod: int):
    """On-device exact rescale Q -> out_mod of CRT residue arrays.

    x_p/x_b: u32 arrays (values mod p_i / b_i).  Returns u32 array of
    round(v * out_mod / Q) mod out_mod, bit-identical to the host
    rescale_array path (Q is odd, so round-to-nearest never ties and
    floor((v*c + Q//2) / Q) is exact; ref: src/poly.cpp:578-601).

    All arithmetic is u32 multiword: N = v*c + Q//2 as three 32-bit words,
    then floor(N / Q) by binary search over the quotient bits (one fused
    compare/select step per output-modulus bit — the response is only
    n1*n2*d coefficients, so this costs microseconds on the VPU).
    """
    import jax.numpy as jnp

    from ..arith.crt import lift_pair
    from ..arith.u32 import mul32_wide

    c = int(out_mod)
    assert c < (1 << 31), "quotient must fit a u32 lane"
    qbits = c.bit_length()
    hi, lo = lift_pair(x_p, x_b)                   # v < Q < 2^56
    cc = jnp.uint32(c)
    h1, w0 = mul32_wide(lo, cc)
    h2, l2 = mul32_wide(hi, cc)
    w1 = h1 + l2
    w2 = h2 + (w1 < h1).astype(jnp.uint32)
    half = Q // 2
    hl, hh = jnp.uint32(half & 0xFFFFFFFF), jnp.uint32(half >> 32)
    nw0 = w0 + hl
    carry = (nw0 < w0).astype(jnp.uint32)
    nw1 = w1 + hh + carry
    carry2 = ((nw1 < w1) | ((nw1 == w1) & (carry > 0))).astype(jnp.uint32)
    nw2 = w2 + carry2

    Ql, Qh = jnp.uint32(Q & 0xFFFFFFFF), jnp.uint32(Q >> 32)
    y = jnp.zeros_like(x_p)
    for bit in range(qbits - 1, -1, -1):
        cand = y | jnp.uint32(1 << bit)
        p0h, p0l = mul32_wide(cand, Ql)
        p1h, p1l = mul32_wide(cand, Qh)
        P1 = p0h + p1l
        P2 = p1h + (P1 < p0h).astype(jnp.uint32)
        le = ((P2 < nw2) | ((P2 == nw2) &
                            ((P1 < nw1) | ((P1 == nw1) & (p0l <= nw0)))))
        y = jnp.where(le, cand, y)
    return jnp.where(y >= cc, y - cc, y)


def pack_bits(vals: np.ndarray, bit_width: int) -> bytes:
    """Serialize values at bit_width bits each (ref: core.cpp:32-52)."""
    acc = 0
    vals = np.asarray(vals, dtype=object).ravel()
    total_bits = bit_width * len(vals)
    for i, v in enumerate(vals[::-1]):
        acc = (acc << bit_width) | int(v)
    nbytes = (total_bits + 7) // 8
    return int(acc).to_bytes(nbytes, "little")


def unpack_bits(data: bytes, bit_width: int, count: int) -> np.ndarray:
    acc = int.from_bytes(data, "little")
    mask = (1 << bit_width) - 1
    out = np.empty(count, dtype=object)
    for i in range(count):
        out[i] = acc & mask
        acc >>= bit_width
    return out
