"""Multi-device scaling-efficiency benchmark (BASELINE.md north star:
>= 80% scaling efficiency at N devices; SURVEY.md §2.7).

Runs the DB-dependent server phase (row-sharded MXU first-dim multiply +
distributed GSW fold) for mesh sizes 1..N on this host's devices and
reports T(1)/(n*T(n)).  On a TPU pod slice this measures real ICI
scaling; on the CPU backend with virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N) it validates the
sharded program and gives a rough shape (virtual devices share host
cores, so absolute efficiency is noisy there).

    python tools/scaling_bench.py --preset spiral_20_256 --devices 1,2,4,8
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --preset tiny8 --devices 1,2,4,8
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="spiral_20_256")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--implicit", action="store_true",
                    help="implicit working-set DB (huge-DB mode)")
    ap.add_argument("--slab-bytes", type=int, default=2 << 30)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/spiral_jax_cache")

    from spiral_tpu.params import PRESETS, Params, preset
    from spiral_tpu.pir import SpiralClient, SpiralServer
    from spiral_tpu.dist.shard import make_db_mesh
    from spiral_tpu.server.db import (encode_db, random_db,
                                      random_implicit_db)

    if args.preset == "tiny8":
        params = Params(nu_1=2, nu_2=3, p_db=256, q_prime_bits=20, t_gsw=8,
                        t_conv=4, t_exp=8, t_exp_right=8, poly_len=256)
    else:
        params = preset(args.preset)

    sizes = [int(x) for x in args.devices.split(",")]
    avail = len(jax.devices())
    sizes = [n for n in sizes if n <= avail]
    rng = np.random.default_rng(0)

    client = SpiralClient(params, seed=1)
    pub = client.setup()
    if args.implicit:
        db = random_implicit_db(params, rng, max_slab_bytes=args.slab_bytes)
        pts = None
    else:
        pts = random_db(params, rng)
        db = encode_db(pts, params)
    idx = int(rng.integers(0, params.total_n))
    query = client.query(idx)

    rows = []
    t1 = None
    for n in sizes:
        mesh = make_db_mesh(jax.devices()[:n]) if n > 1 else None
        server = SpiralServer(params, db, pub, mesh=mesh)
        best = None
        for _ in range(max(1, args.trials)):
            resp, s = server.process_query_fused(query)
            best = s if best is None else min(best, s)
        correct = None
        if pts is not None:
            correct = bool(np.array_equal(client.decode(resp),
                                          pts[idx].astype(object)))
            assert correct, f"mesh size {n}: wrong record"
        if t1 is None:
            t1 = best
        rows.append({"devices": n, "server_s": round(best, 4),
                     "correct": correct,
                     "speedup": round(t1 / best, 3),
                     "efficiency": round(t1 / (n * best), 3)})
        print(f"n={n}: {best:.4f}s speedup={t1/best:.2f}x "
              f"eff={t1/(n*best):.2f}", file=sys.stderr, flush=True)

    result = {"metric": "scaling_efficiency",
              "value": rows[-1]["efficiency"] if len(rows) > 1 else 1.0,
              "unit": "T1/(N*TN)",
              "detail": {"preset": args.preset, "backend":
                         jax.default_backend(), "rows": rows}}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
