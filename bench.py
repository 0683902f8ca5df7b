#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default mode: one fresh Ray session (``address="local"``,
``num_cpus=$RAY_GRAFT_CPUS`` or 32), then

  1. the HEADLINE pipeline — raw tokens -> 1m -> 1h -> 1d tier rollup over a
     deterministic synthetic tokens table (schema = BASELINE.json input_hint,
     generated once under /tmp and reused), reporting rolled-up points/sec;
  2. every ``queries()`` entry over ``$GRAFT_SF_DIR`` (default
     /root/testdata/sf0.1), each timed to full materialization.

Prints ONE COMPACT JSON line (kept well under the driver's ~2000-char tail
capture; ADVICE r1):
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "num_cpus": N, "headline_pps": P}
Full detail (per-query row counts, headline tier breakdown) goes to the
sidecar ``bench_detail.json`` next to this script.

``--scaling``: the sandbox substitute for the north rule's N vs 4N-node
criterion (SURVEY.md §4.3). Protocol (VERDICT r1 #1): PAIRWISE-INTERLEAVED
fresh-process runs of the identical headline job at num_cpus=N and 4N
(default 8 and 32), alternating arm order each pair to cancel drift on this
noisy shared VM; reports the per-pair efficiencies
``eff_i = (thr_4N_i / thr_N_i) / 4``, their MEDIAN, and EVERY individual
run. BASELINE.md gets the new window APPENDED to a measurement log — prior
windows are never overwritten.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HEADLINE_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "200000"))
# --scaling uses a larger input so per-task compute dominates fixed costs
# (SURVEY.md §4.3: "keep per-task work large enough").
SCALING_ROWS = int(os.environ.get("GRAFT_SCALING_ROWS", "2000000"))
BENCH_TMP = "/tmp/thunder_ray_bench"


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _headline_input(rows: int) -> str:
    """Deterministic synthetic tokens parquet, generated once and reused."""
    from thunder_ray.synth import write_tokens_parquet

    path = os.path.join(BENCH_TMP, f"tokens_{rows}")
    try:
        return write_tokens_parquet(path, rows)
    except ValueError:
        # stale scratch from an older generator version (the _SUCCESS stamp
        # is versioned) — this dir is bench-owned scratch, so regenerate
        shutil.rmtree(path, ignore_errors=True)
        return write_tokens_parquet(path, rows)


def _warmup(num_cpus: int):
    """Spawn the worker pool before timing (cluster startup is not throughput)."""
    import ray.data as rd

    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()


def run_headline(rows: int, num_cpus: int) -> dict:
    """raw -> 1m -> 1h -> 1d over the synthetic table (fused streaming path)."""
    from thunder_ray.pipelines.tiers import rollup_streaming

    inp = _headline_input(rows)
    out_root = os.path.join(BENCH_TMP, f"out_{os.getpid()}")
    if os.path.exists(out_root):
        shutil.rmtree(out_root)
    _warmup(num_cpus)
    t0 = time.perf_counter()
    metrics = rollup_streaming(inp, out_root, t0_column=None)
    wall = time.perf_counter() - t0
    shutil.rmtree(out_root, ignore_errors=True)
    points = sum(v for k, v in metrics.items() if k.startswith("points_"))
    return {
        "rows": rows,
        "wall_sec": round(wall, 3),
        "rolled_points": points,
        "points_per_sec": round(points / wall, 1),
        "tiers": {k: v for k, v in metrics.items() if k.startswith("points_")},
    }


def _consume(res) -> int:
    """Force full execution of a query result; return its row count."""
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.materialize().count()
    return len(res)


def run_queries(sf_dir: str) -> tuple[dict, dict]:
    from thunder_ray.pipelines.queries import build_queries

    times, rows = {}, {}
    for name, fn in build_queries().items():
        t0 = time.perf_counter()
        rows[name] = _consume(fn(sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    return times, rows


DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_detail.json")


def main_default(num_cpus: int, sf_dir: str, sf_label) -> dict:
    _init_ray(num_cpus)
    headline = run_headline(HEADLINE_ROWS, num_cpus)
    qtimes, qrows = run_queries(sf_dir)
    total = round(headline["wall_sec"] + sum(qtimes.values()), 2)
    # Full detail to the sidecar; the printed line stays compact (ADVICE r1).
    with open(DETAIL_PATH, "w") as f:
        json.dump({"headline": headline, "queries": qtimes,
                   "query_rows": qrows, "sf": sf_label,
                   "num_cpus": num_cpus,
                   "notes": ("tier-consuming queries (rolling/retention/asof/"
                             "gorilla/compression and the 1h/1d rollups, which "
                             "re-roll the cached 1m tier) amortize 1m-tier "
                             "construction across the suite: the FIRST tier "
                             "consumer's time includes building the shared "
                             "materialized tier (queries._TIER_CACHE), later "
                             "ones read it from the object store — per-query "
                             "times are suite-order dependent by design "
                             "(ADVICE r2). The same applies to the shingle "
                             "scan (dedup._SHINGLE_CACHE: exact/capped ngram, "
                             "contamination, dup-cluster queries) and the "
                             "duplicate-cluster labels (queries8._CC_CACHE: "
                             "dup_clusters, dedup_apply). Absolute suite wall "
                             "also varies with the shared VM's DRAM window "
                             "(BASELINE.md probes swing >2x between windows "
                             "on identical code); compare per-query times "
                             "within one run, not across runs")}, f, indent=1)
    return {
        "metric": "rollup pts/s + query suite",
        "value": total,
        "unit": "sec",
        # 1-decimal per-query times keep the line comfortably under the
        # driver's ~2000-char tail capture; full precision in the sidecar
        "queries": {k: round(v, 1) for k, v in qtimes.items()},
        "sf": sf_label,
        "num_cpus": num_cpus,
        "headline_pps": round(headline["points_per_sec"]),
    }


def main_child(num_cpus: int, rows: int) -> dict:
    """Headline only, fresh session — used by --scaling via subprocess."""
    _init_ray(num_cpus)
    return {"num_cpus": num_cpus, **run_headline(rows, num_cpus)}


def _spawn_headline(num_cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(num_cpus)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child-headline",
         "--num-cpus", str(num_cpus), "--rows", str(rows)],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _calibration_kernel(batch):
    """Compute-bound map_batches kernel (L2-resident xorshift rounds): used
    to measure the ENGINE's scheduling/scaling overhead separately from the
    sandbox VM's DRAM-bandwidth wall (see BASELINE.md scaling section)."""
    import numpy as np

    a = np.arange(100_000, dtype=np.uint64) + 0x9E3779B97F4A7C15
    for _ in range(120):
        a ^= a << np.uint64(13)
        a ^= a >> np.uint64(7)
        a ^= a << np.uint64(17)
    return {"checksum": np.asarray([int(a[0])], dtype=np.uint64)}


def _spawn_calibration(num_cpus: int, tasks: int = 256) -> dict:
    code = (
        "import ray, time, json, sys\n"
        f"ray.init(address='local', num_cpus={num_cpus}, include_dashboard=False, log_to_driver=False)\n"
        "import ray.data as rd\n"
        "rd.DataContext.get_current().enable_progress_bars = False\n"
        "sys.path.insert(0, %r)\n"
        "from bench import _calibration_kernel\n"
        f"rd.range({num_cpus} * 4, override_num_blocks={num_cpus} * 4).map_batches(lambda b: b, batch_format='pyarrow').materialize()\n"
        "t0 = time.perf_counter()\n"
        f"rd.range({tasks}, override_num_blocks={tasks}).map_batches(_calibration_kernel).materialize()\n"
        "dt = time.perf_counter() - t0\n"
        f"print(json.dumps({{'num_cpus': {num_cpus}, 'wall_sec': round(dt, 3), 'tasks_per_sec': round({tasks} / dt, 2)}}))\n"
        "ray.shutdown()\n"
    ) % os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def _bw_probe(_=None) -> float:
    import numpy as np

    a = np.ones(32_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(4):
        a.sum()
    return 4 * a.nbytes / (time.perf_counter() - t0) / 1e9


def _dram_bandwidth() -> dict:
    """Measured DRAM ceiling of this sandbox (context for the scaling table)."""
    import multiprocessing as mp

    res = {"1way_gbps": round(_bw_probe(), 2)}
    for k in (4, 8):
        with mp.Pool(k) as p:
            vals = p.map(_bw_probe, range(k))
        res[f"{k}way_total_gbps"] = round(sum(vals), 2)
    return res


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main_scaling(n: int, pairs: int = 5) -> dict:
    """Pairwise-interleaved N vs 4N runs; median pair efficiency; every run
    reported and APPENDED (never overwritten) to BASELINE.md (VERDICT r1 #1)."""
    # Generate the shared input once (driver-side, no Ray needed).
    _headline_input(SCALING_ROWS)
    runs_lo, runs_hi, pair_effs = [], [], []
    for i in range(pairs):
        # Alternate arm order each pair so slow-window drift hits both arms
        # symmetrically instead of biasing one.
        order = [n, 4 * n] if i % 2 == 0 else [4 * n, n]
        pair = {c: _spawn_headline(c, SCALING_ROWS) for c in order}
        runs_lo.append(pair[n])
        runs_hi.append(pair[4 * n])
        pair_effs.append(round(
            (pair[4 * n]["points_per_sec"] / pair[n]["points_per_sec"]) / 4.0, 3))
    med_eff = round(_median(pair_effs), 3)
    cal_lo = _spawn_calibration(n)
    cal_hi = _spawn_calibration(4 * n)
    cal_eff = (cal_hi["tasks_per_sec"] / cal_lo["tasks_per_sec"]) / 4.0
    result = {
        "metric": "median pairwise scaling efficiency (points/sec at 4N cpus vs N cpus) / 4",
        "value": med_eff,
        "unit": "efficiency",
        "sf": f"synthetic rows={SCALING_ROWS}",
        "num_cpus": [n, 4 * n],
        "pair_efficiencies": pair_effs,
        "runs_low": runs_lo,
        "runs_high": runs_hi,
        "median_low_pps": round(_median([r["points_per_sec"] for r in runs_lo]), 1),
        "median_high_pps": round(_median([r["points_per_sec"] for r in runs_hi]), 1),
        "calibration": {"low": cal_lo, "high": cal_hi, "efficiency": round(cal_eff, 3)},
        "dram": _dram_bandwidth(),
    }
    _update_baseline_md(result)
    return result


_SUMMARY_MARK = "## Scaling evidence (bench.py --scaling)"
_LOG_MARK = "## Scaling measurement log (append-only, every window kept)"


def _pooled_stats(log_text: str, n: int, n4: int) -> dict | None:
    """Distribution-level statistics over EVERY canonical window in the
    append-only log (ADVICE r3 #1: the headline must be pooled, not
    latest-window — a favorable last run must not pick the narrative).
    Parses the machine-written 'Pair efficiencies: [...] -> median **x**'
    lines under canonical `cpus {n} vs {n4}` window headers."""
    import re

    window_medians, all_pairs = [], []
    for m in re.finditer(
            rf"### Window [^\n]*cpus {n} vs {n4}\)\n\nPair efficiencies: "
            rf"(\[[^\]]*\]) -> median \*\*([0-9.]+)\*\*", log_text):
        all_pairs.extend(json.loads(m.group(1)))
        window_medians.append(float(m.group(2)))
    if not window_medians:
        return None
    return {
        "windows": len(window_medians),
        "median_of_window_medians": round(_median(window_medians), 3),
        "pooled_pair_median": round(_median(all_pairs), 3),
        "pairs": len(all_pairs),
    }


def _update_baseline_md(result: dict):
    """Replace the SUMMARY section with the latest CANONICAL window (the
    8-vs-32 protocol BASELINE.json implies); APPEND every window — canonical
    or supplementary (e.g. 2-vs-8 per VERDICT r2 #10) — to the measurement
    log. Prior windows are never deleted (VERDICT r1 #1: no more curated
    narratives), and a supplementary window must not clobber the headline
    summary with a different-arm protocol line."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    n, n4 = result["num_cpus"]
    canonical = (4 * n == DEFAULT_CPUS)
    lo0 = result["runs_low"][0]
    summary = (  # pooled line injected below once the full log text exists

        f"{_SUMMARY_MARK}\n\n"
        f"Protocol: pairwise-INTERLEAVED fresh-process runs (arm order alternated "
        f"each pair) of the identical headline job ({lo0['rows']} docs, "
        f"~{lo0['rolled_points']} rolled points across 1m/1h/1d tiers) at "
        f"num_cpus={n} and {n4}; efficiency per pair = (thr_{n4}/thr_{n})/4; "
        f"headline number = MEDIAN of pairs. All runs of all windows are in the "
        f"measurement log below.\n\n"
        f"Latest window: pair efficiencies {result['pair_efficiencies']}, "
        f"**median = {result['value']}** (north-rule target >= 0.8); median "
        f"throughput {result['median_low_pps']} pts/s at {n} cpus, "
        f"{result['median_high_pps']} pts/s at {n4} cpus.\n\n"
        f"Hardware context for this window: DRAM bandwidth "
        f"{result['dram']['1way_gbps']} GB/s single-stream, "
        f"{result['dram']['4way_total_gbps']} GB/s total at 4 streams, "
        f"{result['dram']['8way_total_gbps']} GB/s at 8 (these swing >2x "
        f"between windows on this shared VM). Compute-bound L2-resident "
        f"calibration on the same Ray Data map_batches path: "
        f"{result['calibration']['low']['tasks_per_sec']} tasks/s at {n} cpus -> "
        f"{result['calibration']['high']['tasks_per_sec']} tasks/s at {n4} cpus "
        f"= {result['calibration']['efficiency']} efficiency. The headline "
        f"pipeline streams tens of bytes/token from DRAM, so when the shared "
        f"bus is contended it flattens before {n4} local workers; a real "
        f"multi-node cluster adds a memory bus per node. The honest report is "
        f"the whole distribution below, not any single window.\n"
    )
    run_rows = "".join(
        f"| {r['num_cpus']} | {r['wall_sec']} | {r['points_per_sec']} |\n"
        for pair in zip(result["runs_low"], result["runs_high"]) for r in pair
    )
    log_entry = (
        f"### Window {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} "
        f"({lo0['rows']} docs, cpus {n} vs {n4})\n\n"
        f"Pair efficiencies: {result['pair_efficiencies']} -> median "
        f"**{result['value']}**; calibration efficiency "
        f"{result['calibration']['efficiency']}; DRAM {result['dram']}.\n\n"
        f"| num_cpus | wall (s) | points/sec |\n|---|---|---|\n{run_rows}\n"
    )
    try:
        text = open(path).read()
    except FileNotFoundError:
        text = ""
    # Replace summary (everything from SUMMARY_MARK up to LOG_MARK or EOF) —
    # but only for a canonical-protocol window; supplementary arm pairs keep
    # the existing summary and just append their window to the log.
    if _SUMMARY_MARK in text:
        head = text[: text.index(_SUMMARY_MARK)]
        existing_summary = text[text.index(_SUMMARY_MARK): text.index(_LOG_MARK)] if _LOG_MARK in text else ""
        tail = text[text.index(_LOG_MARK):] if _LOG_MARK in text else f"{_LOG_MARK}\n\n"
    else:
        head = text.rstrip() + "\n\n"
        existing_summary = ""
        tail = f"{_LOG_MARK}\n\n"
    if not canonical:
        # a supplementary window must never replace the canonical summary —
        # keep the existing one, or drop the summary entirely if none exists
        summary = existing_summary.rstrip() + "\n" if existing_summary else ""
    else:
        # Pooled, distribution-level headline over EVERY canonical window in
        # the log INCLUDING this one (ADVICE r3 #1): report it ahead of the
        # latest-window line so no single run picks the narrative.
        pooled = _pooled_stats(tail + "\n" + log_entry, n, n4)
        if pooled:
            summary = summary.replace(
                "Latest window:",
                f"Pooled across ALL {pooled['windows']} canonical windows in "
                f"the log (the headline statistic): median of window medians "
                f"= **{pooled['median_of_window_medians']}**, pooled median "
                f"of all {pooled['pairs']} individual pair efficiencies = "
                f"**{pooled['pooled_pair_median']}** (north-rule target >= "
                f"0.8; see the hardware-ceiling calibration below).\n\n"
                "Latest window:", 1)
    text = head + summary + "\n" + tail.rstrip() + "\n\n" + log_entry
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--child-headline", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--rows", type=int, default=HEADLINE_ROWS)
    ap.add_argument("--pairs", type=int, default=5,
                    help="interleaved N/4N pairs for --scaling")
    args = ap.parse_args()

    sf_label = os.path.basename(args.sf_dir.rstrip("/")).replace("sf", "") or args.sf_dir

    if args.child_headline:
        payload = main_child(args.num_cpus, args.rows)
    elif args.scaling:
        # N = num_cpus/4 so the arms are N and 4N=num_cpus — with the default
        # 32 this restores the 8-vs-32 configuration BASELINE.json implies
        # (round 1 silently swapped in 2-vs-8; ADVICE r1).
        payload = main_scaling(max(1, args.num_cpus // 4), pairs=args.pairs)
    else:
        payload = main_default(args.num_cpus, args.sf_dir, sf_label)

    # The driver records the LAST ~2000 chars of stdout; a longer line gets
    # its FRONT clipped and becomes unparseable (the r1 'parsed:null' class
    # of failure).  With 77 queries the full per-query dict no longer fits,
    # so keep the SLOWEST queries inline up to a hard budget and note the
    # omission — bench_detail.json always carries every query's time.
    line = json.dumps(payload, separators=(",", ":"))
    budget = 1900
    if len(line) > budget and "queries" in payload:
        full = payload["queries"]
        payload = dict(payload)
        payload["queries_omitted"] = 0
        payload["detail"] = "bench_detail.json"
        keep = {}
        for k, v in sorted(full.items(), key=lambda kv: -kv[1]):
            payload["queries"] = {**keep, k: v}
            payload["queries_omitted"] = len(full) - len(payload["queries"])
            if len(json.dumps(payload, separators=(",", ":"))) > budget:
                payload["queries"] = keep
                payload["queries_omitted"] = len(full) - len(keep)
                break
            keep[k] = v
        line = json.dumps(payload, separators=(",", ":"))
    print(line)

    import ray

    if ray.is_initialized():
        ray.shutdown()
