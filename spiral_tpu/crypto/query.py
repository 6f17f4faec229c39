"""Client query generation for the main (non-pack) variants
(ref: src/spiral.cpp:2099-2193 sigma encoding, 2182-2193 & 2298-2309
direct upload).

Spiral: a single scalar-Regev ct whose coefficients pack the first-dim
indicator (position idx_dim0, or even slots with the stopround trick) and
the GSW digit values (odd slots / tail positions), pre-scaled by 2^{-g}.
SpiralStream: every scalar ct is uploaded directly.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params, Q, get_bits_per
from ..core.poly import PolyMat
from .encrypt import Encryptor


@dataclasses.dataclass
class Query:
    packed_ct: jnp.ndarray | None = None    # (n0, 1, 2, d) NTT
    first_cts: jnp.ndarray | None = None    # (dim0, n0, 1, 2, d) NTT
    gsw_cts: jnp.ndarray | None = None      # (nu2*t_gsw, n0, 1, 2, d) NTT
    size_bytes: int = 0


def _sigma_poly(params: Params, idx: int) -> np.ndarray:
    d = params.poly_len
    idx_dim0 = idx // params.num_per
    idx_further = idx % params.num_per
    ell = params.t_gsw
    bits_per = get_bits_per(ell)
    g, stop = params.g, params.stopround
    sig = np.zeros(d, dtype=object)
    if stop != 0:
        sig[2 * idx_dim0] = params.scale_k
        for i in range(params.further_dims):
            bit = (idx_further >> i) & 1
            for j in range(ell):
                sig[2 * (i * ell + j) + 1] = bit << (bits_per * j)
        inv_first = pow(1 << g, -1, Q)
        inv_rest = pow(1 << (stop + 1), -1, Q)
        sig[0::2] = (sig[0::2] * inv_first) % Q
        sig[1::2] = (sig[1::2] * inv_rest) % Q
    else:
        sig[idx_dim0] = params.scale_k
        off = params.dim0
        for i in range(params.further_dims):
            bit = (idx_further >> i) & 1
            for j in range(ell):
                sig[off + i * ell + j] = bit << (bits_per * j)
        inv = pow(1 << g, -1, Q)
        sig = (sig * inv) % Q
    return sig


def generate_query(params: Params, enc: Encryptor, key, idx: int) -> Query:
    d = params.poly_len
    idx_dim0 = idx // params.num_per
    idx_further = idx % params.num_per
    ell = params.t_gsw
    bits_per = get_bits_per(ell)

    n_cts = params.dim0 + params.further_dims * ell + 1
    ks = jax.random.split(key, n_cts)

    if not params.direct_upload_first:
        assert not params.direct_upload_rest, \
            "partial direct upload (subrounds) not supported yet"
        sigma = PolyMat.from_host(_sigma_poly(params, idx)[None, None, :])
        ct = enc.encrypt_simple_regev(ks[0], sigma)
        return Query(packed_ct=ct.data,
                     size_bytes=params.n0 * params.bytes_per_poly)

    # SpiralStream: direct upload of every scalar ct
    first = []
    for j in range(params.dim0):
        sig = PolyMat.single(params.scale_k if j == idx_dim0 else 0, d)
        first.append(enc.encrypt_simple_regev(ks[1 + j], sig).data)
    gsw = []
    for i in range(params.further_dims):
        bit = (idx_further >> i) & 1
        for j in range(ell):
            val = (bit << (bits_per * j))
            sig = PolyMat.single(val, d)
            gsw.append(enc.encrypt_simple_regev(
                ks[1 + params.dim0 + i * ell + j], sig).data)
    nbytes = (len(first) + len(gsw)) * params.n0 * params.bytes_per_poly
    return Query(first_cts=jnp.stack(first), gsw_cts=jnp.stack(gsw),
                 size_bytes=nbytes)
