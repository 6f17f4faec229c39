"""Figure/benchmark harness (ref: run_all.py / run_scheme.py).

Runs the four scheme variants end-to-end on a scenario, asserts
correctness for every cell (ref: run_all.py check_corr), and prints the
packingcomp-style comparison table plus machine-readable JSON.

    python -m spiral_tpu.harness packingcomp [--scenario 20 256] [--tiny]
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np

VARIANTS = ("spiral", "spiralstream", "spiralpack", "spiralstreampack")


def run_variant(name: str, params, rng, trials: int = 1) -> dict:
    from .params import Params
    pack = "pack" in name
    idx = int(rng.integers(0, params.total_n))
    t_setup0 = time.time()
    if pack:
        from .pack import PackClient, PackServer, encode_pack_db
        client = PackClient(params, seed=1)
        pub = client.setup()
        pts = rng.integers(0, params.p_db, size=(
            params.total_n, params.out_n, params.out_n, params.poly_len),
            dtype=np.int16)
        server = PackServer(params, encode_pack_db(pts, params), pub)
        want = pts[idx].astype(object)
    else:
        from .pir import SpiralClient, SpiralServer
        from .server.db import encode_db_chunked
        client = SpiralClient(params, seed=1)
        pub = client.setup()
        pts = rng.integers(0, params.p_db, size=(
            params.total_n, params.n0, params.n2, params.poly_len),
            dtype=np.int16)
        server = SpiralServer(params, encode_db_chunked(pts, params), pub)
        want = pts[idx].astype(object)
    setup_s = time.time() - t_setup0

    query = client.query(idx)
    best = None
    for _ in range(max(1, trials)):
        resp, server_s = server.process_query_fused(query)
        best = server_s if best is None else min(best, server_s)
    out = client.decode(resp)
    correct = bool(np.array_equal(out, want))

    logp = int(math.log2(params.p_db))
    if pack:
        item_b = params.out_n ** 2 * params.poly_len * logp // 8
        resp_b = (params.out_n ** 2 * params.poly_len * (logp + 2)
                  + params.out_n * params.poly_len *
                  params.q_prime_bits) // 8
    else:
        item_b = params.n0 * params.n2 * params.poly_len * logp // 8
        resp_b = params.response_size_bytes()
    db_b = params.total_n * item_b
    return {
        "variant": name,
        "correct": correct,
        "query_b": query.size_bytes,
        "pub_b": pub.size_bytes,
        "resp_b": resp_b,
        "rate": round(item_b / resp_b, 4),
        "server_s": round(best, 4),
        "tput_MB_s": round(db_b / best / 1e6, 1),
        "setup_s": round(setup_s, 1),
    }


def scenario_params(tiny: bool):
    from .params import preset
    if tiny:
        return {
            "spiral": preset("tiny"),
            "spiralstream": preset("tiny_stream"),
            "spiralpack": preset("tiny_pack"),
            "spiralstreampack": preset("tiny_stream_pack"),
        }
    return {
        "spiral": preset("spiral_20_256"),
        "spiralstream": preset("spiralstream_20_256"),
        "spiralpack": preset("spiralpack_20_256"),
        "spiralstreampack": preset("spiralstreampack_20_256"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("figure", nargs="?", default="packingcomp")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/spiral_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    rows = []
    for name in args.variants.split(","):
        params = scenario_params(args.tiny)[name]
        print(f"running {name}...", file=sys.stderr, flush=True)
        rows.append(run_variant(name, params, rng, args.trials))
        assert rows[-1]["correct"], f"{name} returned a wrong record"

    hdr = ("variant", "query_b", "pub_b", "resp_b", "rate", "server_s",
           "tput_MB_s")
    widths = [max(len(h), 18) for h in hdr]
    line = "  ".join(h.ljust(w) for h, w in zip(hdr, widths))
    print(line, file=sys.stderr)
    for r in rows:
        print("  ".join(str(r[h]).ljust(w) for h, w in zip(hdr, widths)),
              file=sys.stderr)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
