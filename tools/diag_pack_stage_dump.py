"""Dump pack-pipeline intermediates to .npy for TPU-vs-CPU differencing.

Run once on each backend, then diff:
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/diag_pack_stage_dump.py /tmp/pk_cpu
    python tools/diag_pack_stage_dump.py /tmp/pk_tpu     (axon env)
    python tools/diag_pack_stage_dump.py --diff /tmp/pk_cpu /tmp/pk_tpu
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np


def dump(outdir: str):
    import jax.numpy as jnp
    from spiral_tpu.params import preset
    from spiral_tpu.pack import (PackClient, PackServer, encode_pack_db,
                                 pack_ciphertexts)
    from spiral_tpu.arith.ntt import crt_ntt

    params = preset("tiny_pack")
    rng = np.random.default_rng(0)
    idx = int(rng.integers(0, params.total_n))
    client = PackClient(params, seed=1)
    pub = client.setup()
    pts = rng.integers(0, params.p_db, size=(
        params.total_n, params.out_n, params.out_n, params.poly_len),
        dtype=np.int16)
    db = encode_pack_db(pts, params)
    server = PackServer(params, db, pub)
    q = client.query(idx)
    seed = jnp.int32(q.seed)

    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    def save(name, arr):
        np.save(out / f"{name}.npy", np.asarray(arr))

    save("pub_vW", pub.v_W)
    save("pub_Wl", np.stack([np.asarray(w.data) for w in pub.W_exp_left]))
    save("pub_Wr", np.stack([np.asarray(w.data) for w in pub.W_exp_right]))
    save("pub_V", pub.V.data)
    save("db", db.data)
    save("db_limbs", server._db_limbs)
    save("packed_b", q.packed_b)

    first, gsw_src = server._stage_expand(seed, q.packed_b)
    save("first", first)
    save("gsw_src", gsw_src)
    q_pos, q_neg = server._stage_conv(gsw_src)
    save("q_pos", q_pos)
    save("q_neg", q_neg)
    cts = server._stage_fdim(server._db_limbs, first)
    save("cts", cts)
    result = server._stage_fold(cts, q_pos, q_neg)
    save("result", result)
    packed = pack_ciphertexts(result, pub.v_W, params)
    save("packed", packed)
    coeff = crt_ntt(params.poly_len).inverse(packed)
    save("packed_coeff", coeff)
    rows = server._stage_pack(result)
    save("ms_first", rows[0])
    save("ms_rest", rows[1])
    print("dumped to", out)


def diff(a_dir: str, b_dir: str):
    a, b = pathlib.Path(a_dir), pathlib.Path(b_dir)
    for f in sorted(a.glob("*.npy")):
        g = b / f.name
        if not g.exists():
            print(f"{f.stem}: missing in {b}")
            continue
        x, y = np.load(f), np.load(g)
        if x.shape != y.shape:
            print(f"{f.stem}: shape {x.shape} vs {y.shape}")
        elif np.array_equal(x, y):
            print(f"{f.stem}: EQUAL")
        else:
            n = (x != y).sum()
            print(f"{f.stem}: DIFFERS ({n}/{x.size} elems)")


if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        diff(sys.argv[2], sys.argv[3])
    else:
        dump(sys.argv[1])
