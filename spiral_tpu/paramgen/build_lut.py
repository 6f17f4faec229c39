"""Measured stage-time LUT builder (ref: select_params.py --build-exp-lut /
--build-fdim-lut, exp_lut*.json).

Runs configurations end-to-end on the attached backend and records
per-stage timings keyed like the reference's LUTs; `search.select_params`
prefers measured entries over the analytic proxy when ranking.

    python -m spiral_tpu.paramgen.build_lut --presets tiny,tiny_stream \
        --out spiral_tpu/paramgen/tpu_lut.json
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

import numpy as np

DEFAULT_LUT = pathlib.Path(__file__).parent / "tpu_lut.json"


def lut_key(params) -> str:
    return str((params.nu_1, params.nu_2, params.t_exp, params.t_gsw,
                params.out_n if params.out_n else 0))


_LUT_CACHE: dict = {}


def load_lut(path=DEFAULT_LUT) -> dict:
    key = str(path)
    if key not in _LUT_CACHE:
        p = pathlib.Path(path)
        _LUT_CACHE[key] = json.loads(p.read_text()) if p.exists() else {}
    return _LUT_CACHE[key]


def measure(params, pack: bool, trials: int = 2) -> dict:
    from ..harness import run_variant
    rng = np.random.default_rng(0)
    name = "spiralpack" if pack else "spiral"
    row = run_variant(name, params, rng, trials=trials)
    return {
        "server_s": row["server_s"],
        "tput_MB_s": row["tput_MB_s"],
        "query_sz": row["query_b"],
        "resp_sz": row["resp_b"],
        "is_corr": row["correct"],
        "params": dataclasses.asdict(params),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default="tiny")
    ap.add_argument("--out", default=str(DEFAULT_LUT))
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from ..params import preset
    lut = load_lut(args.out)
    for name in args.presets.split(","):
        params = preset(name)
        pack = "pack" in name
        print(f"measuring {name}...", file=sys.stderr, flush=True)
        lut[lut_key(params)] = measure(params, pack, args.trials)
    pathlib.Path(args.out).write_text(json.dumps(lut, indent=1))
    print(json.dumps({"entries": len(lut), "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
