"""End-to-end PIR with directly-uploaded matrix-Regev + GSW ciphertexts.

Exercises the full server pipeline (first-dim multiply, GSW folding,
two-modulus modswitch) and client decode with the fewest moving parts —
the oracle pattern of the reference's self-checking runs (SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiral_tpu.params import preset
from spiral_tpu.core.poly import PolyMat, sub_raw
from spiral_tpu.core.gadget import build_gadget
from spiral_tpu.crypto.keys import keygen
from spiral_tpu.crypto.encrypt import Encryptor
from spiral_tpu.crypto.decode import modswitch_response, decode_response
from spiral_tpu.arith.ntt import crt_ntt
from spiral_tpu.server.db import random_db, encode_db
from spiral_tpu.server.firstdim import multiply_query_by_db, reorient_query
from spiral_tpu.server.fold import fold_ciphertexts


@pytest.mark.parametrize("nonoise", [True, False])
def test_direct_pir_roundtrip(nonoise):
    params = preset("tiny")
    d = params.poly_len
    rng = np.random.default_rng(42)
    key = jax.random.key(7)

    keys = keygen(params, key, nonoise=nonoise)
    enc = Encryptor(keys, d, nonoise=nonoise)

    pts = random_db(params, rng)
    db = encode_db(pts, params)

    idx = int(rng.integers(0, params.total_n))
    idx_dim0 = idx // params.num_per
    idx_further = idx % params.num_per

    # --- query: dim0 matrix-Regev cts of scale_k * I at the target column ---
    keys_iter = jax.random.split(jax.random.key(1), params.dim0 + params.nu_2)
    mat_cts = []
    eye = np.eye(params.n0, dtype=object)[:, :, None] * np.array(
        [1] + [0] * (d - 1), dtype=object)
    for j in range(params.dim0):
        sigma = params.scale_k if j == idx_dim0 else 0
        M = PolyMat.from_host((eye * sigma))
        mat_cts.append(enc.encrypt_matrix(keys_iter[j], M.to_ntt()))
    q_first = jnp.stack([c.data for c in mat_cts])  # (dim0, n1, n0, 2, d)

    # --- GSW cts: slot s encodes bit nu_2-1-s of idx_further ---
    G2 = build_gadget(params.n1, params.m2, d)
    g2_ntt = G2.to_ntt()
    q_pos_l, q_neg_l = [], []
    for s in range(params.nu_2):
        bit = (idx_further >> (params.nu_2 - 1 - s)) & 1
        Q = enc.encrypt_gsw_direct(keys_iter[params.dim0 + s], bit, G2)
        q_pos_l.append(Q.data)
        q_neg_l.append(sub_raw(g2_ntt.data, Q.data))
    q_pos = jnp.stack(q_pos_l)
    q_neg = jnp.stack(q_neg_l)

    # --- server ---
    qk = reorient_query(q_first)
    cts_ntt = multiply_query_by_db(db, qk)          # (num_per, n1, n2, 2, d)
    cts_coeff = crt_ntt(d).inverse(cts_ntt)
    final = fold_ciphertexts(cts_coeff, q_pos, q_neg, params)
    final_host = PolyMat(final, ntt=False).to_host_int()
    resp = modswitch_response(final_host, params)

    # --- client decode ---
    out = decode_response(resp, keys.Sp_centered, params)
    want = pts[idx].astype(object)
    np.testing.assert_array_equal(out, want)
