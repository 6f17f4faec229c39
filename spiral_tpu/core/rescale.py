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
