"""Negacyclic NTT table generation (host side, pure python integers).

Plays the role of the reference's offline table generator + constants blob
(ref: src/gentables.cpp, src/constants.cpp) but derives everything from
first principles: find a primitive 2d-th root of unity psi mod p, build
per-stage Stockham twiddles for the cyclic NTT on omega = psi^2, plus the
negacyclic twist/untwist vectors, each with Shoup companions.

The NTT convention here differs from the reference's bit-reversed SEAL
tables (any self-consistent ordering of the evaluation domain is valid for
pointwise ring arithmetic); correctness is validated against schoolbook
negacyclic convolution instead of the reference's table blob.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np

from .mod import mod_ctx


def _factorize(n: int) -> list[int]:
    fs, d = [], 2
    while d * d <= n:
        if n % d == 0:
            fs.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        fs.append(n)
    return fs


def primitive_root(p: int) -> int:
    phi = p - 1
    fs = _factorize(phi)
    g = 2
    while True:
        if all(pow(g, phi // q, p) != 1 for q in fs):
            return g
        g += 1


@dataclasses.dataclass(frozen=True)
class NttTables:
    """Tables for one modulus p and ring degree d (host numpy arrays —
    cached tables must never hold traced device values)."""

    p: int
    d: int
    twist: np.ndarray           # psi^i, i in [0, d)
    twist_shoup: np.ndarray
    untwist: np.ndarray         # d^{-1} * psi^{-i}
    untwist_shoup: np.ndarray
    fwd_tw: tuple                # per stage s: omega^{2^s * j}, j in [0, d/2^{s+1})
    fwd_tw_shoup: tuple
    inv_tw: tuple                # inverses of fwd_tw
    inv_tw_shoup: tuple


@lru_cache(maxsize=None)
def ntt_tables(p: int, d: int) -> NttTables:
    assert (p - 1) % (2 * d) == 0, f"2*{d} must divide {p}-1"
    ctx = mod_ctx(p)
    g = primitive_root(p)
    psi = pow(g, (p - 1) // (2 * d), p)
    omega = pow(psi, 2, p)
    psi_inv = pow(psi, p - 2, p)
    d_inv = pow(d, p - 2, p)

    idx = np.arange(d, dtype=object)
    twist = np.array([pow(psi, int(i), p) for i in range(d)], dtype=np.uint64)
    untwist = np.array(
        [(d_inv * pow(psi_inv, int(i), p)) % p for i in range(d)],
        dtype=np.uint64)

    L = d.bit_length() - 1
    fwd_tw, fwd_sh, inv_tw, inv_sh = [], [], [], []
    for s in range(L):
        t = d >> (s + 1)
        w = pow(omega, 1 << s, p)
        tw = np.empty(t, dtype=np.uint64)
        cur = 1
        for j in range(t):
            tw[j] = cur
            cur = (cur * w) % p
        tw_inv = np.array([pow(int(v), p - 2, p) for v in tw], dtype=np.uint64)
        fwd_tw.append(tw.astype(np.uint32))
        fwd_sh.append(ctx.shoup(tw))
        inv_tw.append(tw_inv.astype(np.uint32))
        inv_sh.append(ctx.shoup(tw_inv))

    return NttTables(
        p=p, d=d,
        twist=twist.astype(np.uint32),
        twist_shoup=ctx.shoup(twist),
        untwist=untwist.astype(np.uint32),
        untwist_shoup=ctx.shoup(untwist),
        fwd_tw=tuple(fwd_tw), fwd_tw_shoup=tuple(fwd_sh),
        inv_tw=tuple(inv_tw), inv_tw_shoup=tuple(inv_sh),
    )
