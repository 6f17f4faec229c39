"""NTT engine microbenchmark: mxu (four-step XLA) vs pallas (fused) vs
stockham (VPU butterflies), forward+inverse, at fold-round batch sizes.

    PYTHONPATH=/root/repo python tools/bench_ntt.py [--batch 12288]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="768,12288")
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from spiral_tpu.params import P_I
    print(f"devices: {jax.devices()}")

    from spiral_tpu.arith.ntt import CrtNtt
    from spiral_tpu.arith.ntt_mxu import CrtNttMxu
    from spiral_tpu.arith.ntt_pallas import CrtNttPallas

    engines = {
        "stockham": CrtNtt(args.d),
        "mxu": CrtNttMxu(args.d),
    }
    try:
        engines["pallas"] = CrtNttPallas(args.d)
    except Exception as e:  # Mosaic may be unavailable
        print(f"pallas engine unavailable: {e}")

    rng = np.random.default_rng(0)
    for batch in [int(b) for b in args.batches.split(",")]:
        x = jnp.asarray(rng.integers(0, P_I, size=(batch, 2, args.d),
                                     dtype=np.uint32))
        print(f"--- batch={batch} x (2, {args.d}) ---")
        for name, eng in engines.items():
            for dirn in ("forward", "inverse"):
                fn = getattr(eng, dirn)

                # chain CH dependent transforms inside one jit so the
                # device must execute them serially; a host-fetched scalar
                # forces completion (block_until_ready over a remote
                # tunnel can under-report otherwise)
                CH = 8

                @jax.jit
                def chained(x, fn=fn):
                    y = x
                    for _ in range(CH):
                        y = fn(y) ^ jnp.uint32(1)
                    return y[0, 0, 0]

                try:
                    float(chained(x))
                except Exception as e:
                    print(f"{name:9s} {dirn:8s} FAILED: {type(e).__name__}")
                    import traceback
                    traceback.print_exc()
                    break
                best = float("inf")
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(chained(x))
                    best = min(best, time.perf_counter() - t0)
                best /= CH
                polys_per_s = batch * 2 / best
                print(f"{name:9s} {dirn:8s} {best*1e3:8.3f} ms "
                      f"({polys_per_s/1e6:.2f}M poly-limbs/s)")


if __name__ == "__main__":
    main()
