"""Client query generation (ref: src/spiral.cpp:2099-2193 sigma encoding,
2182-2193 & 2298-2309 direct upload).

Queries are seed-compressed: every scalar-Regev ciphertext is (-a, b) with
`a` drawn from a PRF stream, so the query carries one 32-bit seed plus the
b-polynomial(s) only.  The server re-derives the a-halves from the seed.
This makes the reference's reported query sizes (one polynomial per
scalar ct, e.g. 14,336 B for the packed Spiral query) literal.

Spiral: a single ct whose coefficients pack the first-dim indicator
(position idx_dim0, or even slots with the stopround trick) and the GSW
digit values (odd slots / tail positions), pre-scaled by 2^-g.
SpiralStream: every scalar ct is uploaded directly.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params, Q, get_bits_per
from ..arith.ntt import crt_ntt
from ..core.poly import PolyMat, add_raw, neg_raw, scalar_mul_raw
from ..core.sampling import gaussian_residues, uniform_residues
from .encrypt import Encryptor


@dataclasses.dataclass
class Query:
    seed: int
    packed_b: jnp.ndarray | None = None   # (1, 1, 2, d) NTT
    first_b: jnp.ndarray | None = None    # (dim0, 1, 1, 2, d) NTT
    gsw_b: jnp.ndarray | None = None      # (n_gsw, 1, 1, 2, d) NTT
    size_bytes: int = 0


def derive_a_ntt(seed, n_cts: int, d: int):
    """PRF-derived uniform a-halves, NTT domain: (n_cts, 1, 1, 2, d).
    Shared verbatim by client and server; `seed` may be a python int or a
    traced int32 scalar (so servers don't recompile per query)."""
    key = jax.random.key(seed)
    a = uniform_residues(key, (n_cts, 1, 1, d))
    return crt_ntt(d).forward(a)


def reconstruct_cts(seed, b_ntt):
    """Server side: (-a, b) scalar cts from the seed + b rows.
    b_ntt: (n, 1, 1, 2, d) -> (n, 2, 1, 2, d)."""
    a_ntt = derive_a_ntt(seed, b_ntt.shape[0], b_ntt.shape[-1])
    return jnp.concatenate([neg_raw(a_ntt), b_ntt], axis=-4)


def encrypt_b_batch(enc: Encryptor, noise_key, seed: int, sigmas_ntt):
    """b = a*sr + e + sigma for a batch of sigmas (n, 1, 1, 2, d) NTT."""
    n, d = sigmas_ntt.shape[0], sigmas_ntt.shape[-1]
    a_ntt = derive_a_ntt(seed, n, d)
    sr_ntt = enc.keys.sr.to_ntt().data[0, 0]
    asr = scalar_mul_raw(sr_ntt, a_ntt)
    if enc.nonoise:
        e_ntt = jnp.zeros_like(sigmas_ntt)
    else:
        e = gaussian_residues(noise_key, (n, 1, 1, d))
        e_ntt = crt_ntt(d).forward(e)
    return add_raw(add_raw(asr, e_ntt), sigmas_ntt)


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


def stream_sigmas(params: Params, idx: int) -> np.ndarray:
    """Direct-upload sigma list: dim0 indicators then GSW digit values.
    Returns (dim0 + nu2*t_gsw,) object ints."""
    idx_dim0 = idx // params.num_per
    idx_further = idx % params.num_per
    ell = params.t_gsw
    bits_per = get_bits_per(ell)
    sig = np.zeros(params.dim0 + params.further_dims * ell, dtype=object)
    sig[idx_dim0] = params.scale_k
    for i in range(params.further_dims):
        bit = (idx_further >> i) & 1
        for j in range(ell):
            sig[params.dim0 + i * ell + j] = bit << (bits_per * j)
    return sig


def _const_sigmas_ntt(vals: np.ndarray, d: int):
    """(n,) object ints -> (n, 1, 1, 2, d) NTT residue tensor (constants
    are NTT-invariant only after the transform; build coeff then NTT)."""
    n = len(vals)
    arr = np.zeros((n, 1, 1, d), dtype=object)
    arr[:, 0, 0, 0] = vals
    return crt_ntt(d).forward(PolyMat.from_host(arr).data)


def subround_sigma_polys(params: Params, idx: int) -> np.ndarray:
    """Sigma polynomials for the general subround upload
    (ref: src/spiral.cpp:2116-2155, round/subround loop with stopround=0).
    Returns (n_first_cts + n_rest_cts, d) object ints."""
    plan = params.expansion_plan()
    d = params.poly_len
    idx_dim0 = idx // params.num_per
    idx_further = idx % params.num_per
    ell = params.t_gsw
    bits_per = get_bits_per(ell)
    out = []

    pf = plan["first"]
    if pf["direct"]:
        for j in range(params.dim0):
            s = np.zeros(d, dtype=object)
            if j == idx_dim0:
                s[0] = params.scale_k
            out.append(s)
    else:
        inv = pow(1 << pf["g"], -1, Q)
        for srd in range(pf["n_cts"]):
            s = np.zeros(d, dtype=object)
            if idx_dim0 // pf["bits"] == srd:
                s[idx_dim0 % pf["bits"]] = (params.scale_k * inv) % Q
            out.append(s)

    pr = plan["rest"]
    vals = []
    for i in range(params.further_dims):
        bit = (idx_further >> i) & 1
        for j in range(ell):
            vals.append(bit << (bits_per * j))
    if pr["direct"]:
        for v in vals:
            s = np.zeros(d, dtype=object)
            s[0] = v
            out.append(s)
    else:
        inv = pow(1 << pr["g"], -1, Q)
        for srd in range(pr["n_cts"]):
            s = np.zeros(d, dtype=object)
            for ctr, v in enumerate(
                    vals[srd * pr["bits"]:(srd + 1) * pr["bits"]]):
                s[ctr] = (v * inv) % Q
            out.append(s)
    return np.stack(out)


def generate_query(params: Params, enc: Encryptor, key, idx: int) -> Query:
    d = params.poly_len
    seed = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    knoise = jax.random.fold_in(key, 1)
    plan = params.expansion_plan()

    if plan is None:
        # single packed ct, stopround interleave
        sigma = PolyMat.from_host(_sigma_poly(params, idx)[None, None, :])
        sig_ntt = sigma.to_ntt().data[None]
        b = encrypt_b_batch(enc, knoise, seed, sig_ntt)
        return Query(seed=seed, packed_b=b,
                     size_bytes=params.bytes_per_poly)

    # general subround / direct upload
    sigs = subround_sigma_polys(params, idx)
    sig_ntt = crt_ntt(d).forward(
        PolyMat.from_host(sigs[:, None, None, :]).data)
    b = encrypt_b_batch(enc, knoise, seed, sig_ntt)
    n_first = plan["first"]["n_cts"]
    return Query(seed=seed, first_b=b[:n_first], gsw_b=b[n_first:],
                 size_bytes=len(sigs) * params.bytes_per_poly)
