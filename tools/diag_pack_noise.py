"""Stagewise empirical noise diagnosis for the pack pipeline (tiny_pack).

Decrypts intermediates after expansion, first-dim, fold and pack and
prints log2 error variance per stage next to the analytic model, to
localize where the implementation's noise departs from the model.

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/diag_pack_noise.py
"""
from __future__ import annotations

import math
import sys

import jax.numpy as jnp
import numpy as np

from spiral_tpu.params import preset, Q
from spiral_tpu.arith.ntt import crt_ntt
from spiral_tpu.core.poly import PolyMat, add_raw, scalar_mul_raw, matmul_raw
from spiral_tpu.pack import PackClient, PackServer, encode_pack_db
from spiral_tpu.paramgen import noise as NM


def center(v):
    return np.where(v >= Q // 2, v - Q, v)


def logvar(err):
    e = np.asarray(err, dtype=object).ravel()
    var = float(sum(int(x) * int(x) for x in e)) / len(e)
    return math.log2(var) if var else -1.0


def dec_scalar(ct, keys, eng):
    """ct: (2, 1, 2, d) NTT scalar ct -> coeff PolyMat value sr*c0 + c1."""
    sr_ntt = keys.sr.to_ntt().data[0, 0]
    v = add_raw(scalar_mul_raw(sr_ntt, ct[0:1]), ct[1:2])
    return PolyMat(eng.inverse(v), ntt=False).to_host_int()


def main():
    params = preset("tiny_pack")
    d = params.poly_len
    eng = crt_ntt(d)
    rng = np.random.default_rng(0)
    _ = rng.integers(0, params.total_n)
    idx = 13
    client = PackClient(params, seed=1)
    pub = client.setup()
    pts = rng.integers(0, params.p_db, size=(
        params.total_n, params.out_n, params.out_n, d), dtype=np.int16)
    server = PackServer(params, encode_pack_db(pts, params), pub)
    q = client.query(idx)
    keys = client.keys

    seed = jnp.int32(q.seed)
    first, gsw_src = server._stage_expand(seed, q.packed_b)
    q_pos, q_neg = server._stage_conv(gsw_src)
    cts_coeff = server._stage_fdim(server._db_limbs, first)
    result = server._stage_fold(cts_coeff, q_pos, q_neg)

    idx_dim0 = idx // params.num_per
    idx_further = idx % params.num_per
    scale_k = params.scale_k

    # --- expansion output: first[idx_dim0] should encrypt scale_k at coeff 0
    dec = dec_scalar(np.asarray(first[idx_dim0]), keys, eng)[0, 0]
    want = np.zeros(d, dtype=object)
    want[0] = scale_k
    print("exp first-slot err logvar:", logvar(center((dec - want) % Q)))
    # a non-selected slot should encrypt 0
    other = (idx_dim0 + 1) % params.dim0
    dec0 = dec_scalar(np.asarray(first[other]), keys, eng)[0, 0]
    print("exp zero-slot  err logvar:", logvar(center(dec0 % Q)))

    # --- first-dim output, trial (r, c), further slot j
    pts_c = np.asarray(pts, dtype=np.int64)
    cen = np.where(pts_c >= params.p_db // 2, pts_c - params.p_db, pts_c)
    errs = []
    for tr in range(params.out_n ** 2):
        r, c = tr // params.out_n, tr % params.out_n
        for j in range(params.num_per):
            ct = np.asarray(cts_coeff[tr, j])     # (2, 1, 2, d) coeff
            v = add_raw(scalar_mul_raw(keys.sr.to_ntt().data[0, 0],
                                       eng.forward(jnp.asarray(ct[0:1]))),
                        eng.forward(jnp.asarray(ct[1:2])))
            dec = PolyMat(eng.inverse(v), ntt=False).to_host_int()[0, 0]
            want = (cen[j * params.dim0 + idx_dim0, r, c].astype(object)
                    * scale_k) % Q if False else None
            # DB layout: record index = idx_dim0 * num_per + j? check both
            wa = (cen[idx_dim0 * params.num_per + j, r, c].astype(object)
                  * scale_k) % Q
            errs.append(center((dec - wa) % Q))
    print("first-dim err logvar:", logvar(np.concatenate(errs)))

    # --- fold output, per trial
    errs = []
    for tr in range(params.out_n ** 2):
        r, c = tr // params.out_n, tr % params.out_n
        ct = np.asarray(result[tr])               # (2, 1, 2, d) coeff
        v = add_raw(scalar_mul_raw(keys.sr.to_ntt().data[0, 0],
                                   eng.forward(jnp.asarray(ct[0:1]))),
                    eng.forward(jnp.asarray(ct[1:2])))
        dec = PolyMat(eng.inverse(v), ntt=False).to_host_int()[0, 0]
        wa = (cen[idx, r, c].astype(object) * scale_k) % Q
        errs.append(center((dec - wa) % Q))
    print("fold err logvar:", logvar(np.concatenate(errs)))

    # --- packed ct (pre-modswitch): decrypt with S = [Sp | I]
    from spiral_tpu.pack import pack_ciphertexts
    packed = pack_ciphertexts(result, pub.v_W, params)   # (out_n+1, out_n) NTT
    S_ntt = keys.S.to_ntt().data                          # (out_n, out_n+1)
    dec = matmul_raw(S_ntt, packed)                       # (out_n, out_n)
    decs = PolyMat(eng.inverse(dec), ntt=False).to_host_int()
    errs = []
    for r in range(params.out_n):
        for c in range(params.out_n):
            wa = (cen[idx, r, c].astype(object) * scale_k) % Q
            errs.append(center((decs[r, c] - wa) % Q))
    print("pack err logvar:", logvar(np.concatenate(errs)))

    # --- model
    s_e = NM.noise_variance_highrate(params)
    print("model final logvar:", round(math.log2(s_e), 1))
    print("decode margin log2(q/(4p)) =",
          round(math.log2(Q / (4 * params.p_db)), 1))


if __name__ == "__main__":
    main()
