"""The N-vs-4N scaling protocol (BASELINE.md): run the identical crawl job
at local[8] and local[32] on the same input, report throughput at both and
the scaling efficiency, and write BENCH/BASELINE.md.

Each parallelism level runs in its own subprocess (one JVM per parallelism —
a Spark session's core count is fixed at startup). The corpus is generated
once and shared; each run starts from a fresh state dir so the work is
identical. Warm-up rounds (plan compilation + JIT) are excluded from the
steady-state number, which is reported alongside the full-run number.

Usage: python tools/bench_scaling.py [--hosts 2000 --pph 25 --cap 10000
                                      --rounds 7 --warmup 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from x227f_spark.session import get_spark
from x227f_spark.constants import EngineConfig
from x227f_spark.plans.rounds import CrawlEngine

cores = int(sys.argv[1]); corpus_dir = sys.argv[2]; seed = sys.argv[3]
rounds = int(sys.argv[4]); cap = int(sys.argv[5])
recrawl_h = int(sys.argv[6]); round_sec = int(sys.argv[7])
cfg = EngineConfig(starting_point=seed, fetch_cap=cap, queue_cap=4 * cap,
                   round_seconds=round_sec)
if recrawl_h >= 0:
    # recrawl mode: visited pages come due again after `recrawl_h` hours of
    # virtual time (0 = immediately) — sustains full-cap steady-state
    # rounds on a finite corpus, the regime a 10^10-frontier crawl lives in
    from dataclasses import replace
    cfg = replace(cfg, recrawl_hours=recrawl_h, recrawl_popular_hours=recrawl_h)
spark = get_spark(cores=cores, app_name=f"scaling_{{cores}}", driver_memory="48g")
# state snapshots on tmpfs when provided: on a real cluster the state lives
# in distributed storage (Iceberg/HDFS/S3) whose bandwidth scales with the
# executors; on this single box the root disk is one spindle shared by both
# legs, and its writeback stalls bleed into the next round's compute
state_base = os.environ.get("SPARK_GRAFT_STATE_DIR") \
    or os.path.join({repo!r}, "_data")
state = tempfile.mkdtemp(prefix=f"scale{{cores}}_", dir=state_base)
eng = CrawlEngine(spark, corpus_dir, state, config=cfg)
per_round = []
for _ in range(rounds):
    t0 = time.monotonic()
    m = eng.run_round()
    # 1-min load average at round end: a pinned leg can only generate
    # ~`cores` of load itself, so load1 >> cores flags external contention
    # (the failure mode that corrupted earlier unattended runs) right in
    # the evidence file instead of leaving it to post-hoc guesswork
    per_round.append({{"sec": round(time.monotonic() - t0, 2),
                      "fetched": m["fetched"] + m["failed"],
                      "load1": round(os.getloadavg()[0], 2),
                      "timing": m.get("timing", {{}})}})
    print(f"  [{{cores}}c] round {{m['round']}}: {{per_round[-1]}}", file=sys.stderr)
shutil.rmtree(state, ignore_errors=True)
print(json.dumps(per_round))
"""


def _pin(cores: int) -> list[str]:
    """Pin the whole run (JVM task threads + Python UDF workers) to `cores`
    physical CPUs. Without this the local[8] leg spreads its 8 task threads
    plus 8 Python workers over all 32 CPUs — i.e. it isn't an 8-core cluster
    at all, and N-vs-4N efficiency is meaningless."""
    if os.cpu_count() and cores < os.cpu_count():
        return ["taskset", "-c", f"0-{cores - 1}"]
    return []


def wait_for_idle(max_load: float = 4.0, timeout: int = 300) -> float:
    """Block until the machine's 1-min load average drops below
    ``max_load`` (or ``timeout`` elapses). A leg started while another
    heavy job is draining measures that job, not the engine — the same
    lesson bench.py's BENCH_IDLE_WAIT encodes."""
    import time
    deadline = time.monotonic() + timeout
    load = os.getloadavg()[0]
    while load > max_load and time.monotonic() < deadline:
        time.sleep(10)
        load = os.getloadavg()[0]
    return load


def run_level(cores: int, corpus_dir: str, seed: str, rounds: int,
              cap: int, recrawl_hours: int, round_seconds: int,
              timeout: int = 3600) -> list[dict]:
    load = wait_for_idle()
    sys.stderr.write(f"[bench_scaling] starting local[{cores}] leg at "
                     f"load1={load:.2f}\n")
    script = RUNNER.format(repo=REPO)
    env = dict(os.environ)
    out = subprocess.run(
        _pin(cores) + [sys.executable, "-c", script, str(cores), corpus_dir,
                       seed, str(rounds), str(cap), str(recrawl_hours),
                       str(round_seconds)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout)
    sys.stderr.write(out.stderr[-2000:])
    if out.returncode != 0:
        raise RuntimeError(f"level {cores} failed: {out.stderr[-1000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2000)
    ap.add_argument("--pph", type=int, default=25)
    ap.add_argument("--cap", type=int, default=10000)
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--levels", type=str, default="4,16")
    ap.add_argument("--order", type=str, default=None,
                    help="comma list of core counts to run as consecutive "
                         "legs, e.g. '16,4,16' — interleaving the levels in "
                         "time so shared-host drift cancels in the ratio "
                         "instead of biasing one side; every leg is "
                         "retained, best+median per level are reported")
    ap.add_argument("--recrawl-hours", type=int, default=-1,
                    help="-1 = reference default (no recrawl in bench "
                         "horizon); >=0 = recrawl mode for sustained "
                         "full-cap steady-state rounds")
    ap.add_argument("--fanout", type=int, default=100,
                    help="seed-page host fanout (frontier ramp-up speed)")
    ap.add_argument("--round-seconds", type=int, default=15,
                    help="virtual round window; politeness budget/host = "
                         "round_seconds // crawl_delay, so big-round runs "
                         "(millions of URLs) use a bigger window — the "
                         "10^10-frontier design point")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    import bench
    bench.CRAWL_HOSTS = args.hosts
    bench.CRAWL_PAGES_PER_HOST = args.pph
    bench.CRAWL_FANOUT = args.fanout
    bench._prune_scratch()  # clear state dirs leaked by interrupted legs
    corpus_dir, seed = bench._bench_corpus_dir()

    from scaling_report import leg_stats, recompute

    lo, hi = (int(x) for x in args.levels.split(","))
    order = [int(x) for x in args.order.split(",")] if args.order \
        else [lo, hi]
    legs_dir = os.path.join(REPO, "BENCH", "legs")
    os.makedirs(legs_dir, exist_ok=True)
    levels: dict[int, dict] = {}
    for i, cores in enumerate(order):
        rows = run_level(cores, corpus_dir, seed, args.rounds, args.cap,
                         args.recrawl_hours, args.round_seconds,
                         timeout=args.timeout)
        # persist each raw leg immediately — a crashed later leg must not
        # lose measured evidence
        with open(os.path.join(legs_dir,
                               f"leg{i}_{cores}c.json"), "w") as f:
            json.dump(rows, f)
        st = leg_stats(rows, args.warmup)
        lv = levels.setdefault(cores, {
            "all_runs": [], "all_runs_steady_urls_per_sec": [],
            "all_runs_rounds": [], "urls_per_sec_steady": -1.0})
        lv["all_runs"].append([r["sec"] for r in rows])
        lv["all_runs_steady_urls_per_sec"].append(st["urls_per_sec_steady"])
        lv["all_runs_rounds"].append(rows)
        if st["urls_per_sec_steady"] > lv["urls_per_sec_steady"]:
            lv.update(st)
        print(f"leg {i} local[{cores}]: full={st['urls_per_sec_full']} "
              f"steady={st['urls_per_sec_steady']} urls/s")

    out = {
        "input": {"hosts": args.hosts, "pages_per_host": args.pph,
                  "fetch_cap": args.cap, "rounds": args.rounds,
                  "warmup_excluded": args.warmup,
                  "recrawl_hours": args.recrawl_hours,
                  "round_seconds": args.round_seconds,
                  "fanout": args.fanout,
                  "leg_order": order},
        "levels": {str(k): v for k, v in levels.items()},
    }
    recompute(out)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        "efficiency_steady": out["scaling_efficiency_steady"],
        "efficiency_steady_median_leg":
            out["scaling_efficiency_steady_median_leg"],
        "efficiency_full": out["scaling_efficiency_full"]}))
    _write_md(out, lo, hi)


def _write_md(out, lo, hi):
    li, hiv = out["levels"][str(lo)], out["levels"][str(hi)]
    md = f"""# BENCH/BASELINE — measured numbers

Protocol (BASELINE.md): the identical crawl job — same synthetic corpus
({out['input']['hosts']} hosts x {out['input']['pages_per_host']} pages,
fetch cap {out['input']['fetch_cap']}/round, {out['input']['rounds']} rounds
from one seed — run at two parallelism levels on this machine as the sandbox
proxy for N vs 4N executors. Each leg is CPU-pinned (`taskset -c 0-(N-1)`)
so local[{lo}] really is an {lo}-core machine for the JVM task threads AND
the Python/Arrow UDF workers — without pinning the small leg borrows all
{hi} physical CPUs for its UDF workers and the comparison is meaningless.
Shuffle/spill scratch on tmpfs (both legs share one physical disk; on a
real cluster that I/O scales with the executors). Fresh state per run;
corpus-backed fetch (zero network). "Steady" excludes the first
{out['input']['warmup_excluded']} rounds (plan compilation + JIT warm-up +
frontier ramp-up).
Recrawl-hours={out['input'].get('recrawl_hours', -1)} (≥0 → visited pages
come due again, sustaining full-cap rounds on the finite corpus — the
steady-state regime of a production recrawl-heavy frontier; -1 → reference
default intervals). Round window = {out['input'].get('round_seconds', 15)} s
of virtual time (politeness budget/host = window // crawl_delay, so the
fetch cap is reachable across {out['input']['hosts']} hosts); seed fanout
{out['input'].get('fanout', 100)} hosts (PageRank admission bounds the
fanout: a seed linking F hosts contributes 0.85*0.15/outdeg ≈ 0.127/F to
each, which must clear the 0.151 admission threshold, so F ≲ 120 and the
frontier ramps multiplicatively instead).

| level | URLs fetched | full-run URLs/s | steady-state URLs/s |
|---|---|---|---|
| local[{lo}] | {li['fetched']} | {li['urls_per_sec_full']} | {li['urls_per_sec_steady']} |
| local[{hi}] | {hiv['fetched']} | {hiv['urls_per_sec_full']} | {hiv['urls_per_sec_steady']} |

Scaling efficiency (throughput@{hi} / throughput@{lo}) / {hi // lo}:
**{out['scaling_efficiency_full']}** full-run,
**{out['scaling_efficiency_steady']}** steady-state (best leg per level).
"""
    if "scaling_efficiency_steady_median_leg" in out:
        md += (f"Matched-percentile (median leg per level) steady "
               f"efficiency: "
               f"**{out['scaling_efficiency_steady_median_leg']}** — "
               f"cancels a lucky\ndraw on either side of the best-leg "
               f"estimator.\n\nPer-level steady-throughput spread across "
               f"legs (urls/s):\n\n")
        for k in sorted(out["levels"], key=int):
            sp = out["levels"][k].get("steady_spread")
            if sp:
                md += (f"- local[{k}]: n={sp['n_legs']} min={sp['min']} "
                       f"median={sp['median']} max={sp['max']}\n")
    md += f"""
Reference context: the Rust crawler's sustained ceiling is ~6.7 URLs/s
(100 slots x >=1 s/host politeness, network-bound — BASELINE.md); the
engine's corpus-backed throughput is bounded by compute + per-round
control-plane latency instead, which on a real cluster amortizes over far
larger rounds (the 10^10-frontier design sizes rounds at millions of URLs).

Per-round seconds:

- local[{lo}]: {[r['sec'] for r in li['rounds']]}
- local[{hi}]: {[r['sec'] for r in hiv['rounds']]}
"""
    slo = li.get("steady_stage_avg_sec") or {}
    shi = hiv.get("steady_stage_avg_sec") or {}
    if slo and shi:
        md += """
## Amdahl decomposition (steady-state stage averages, sec/round)

| stage | local[%d] | local[%d] | stage speedup |
|---|---|---|---|
""" % (lo, hi)
        for key in ("rank", "sched", "fetch", "plan", "write"):
            a, b = slo.get(key), shi.get(key)
            if a and b:
                md += f"| {key} | {a} | {b} | {round(a / b, 2)}x |\n"
        md += (
            "\n`fetch`/`write`/`rank` are the distributed data plane (what a"
            " real cluster\nreplicates per executor); `sched`/`plan` are the"
            " per-round control-plane floor\n(driver latency + small-job"
            " barriers) that amortizes as rounds grow toward the\n10^10"
            "-frontier design point (millions of URLs per round).\n")
    cb_path = os.path.join(REPO, "BENCH", "commit_obatch.json")
    if os.path.exists(cb_path):
        with open(cb_path) as f:
            cb = json.load(f)
        l1, l2 = cb["legs"]["1x"], cb["legs"]["2x"]
        md += f"""
## Commit-path scaling (merge-on-read, tools/bench_commit.py)

The per-round state commit is O(batch): doubling the table's state size
with the SAME batch leaves the delta-commit time unchanged.

| state rows | batch | median delta-commit sec |
|---|---|---|
| {l1['state_rows']} | {l1['batch']} | {l1['median_delta_commit_sec']} |
| {l2['state_rows']} | {l2['batch']} | {l2['median_delta_commit_sec']} |

Ratio (2x state / 1x state): **{cb['write_time_ratio_2x_state']}** (≈1.0 ⇒
independent of state; the old copy-on-write rebuild measured ≈2.0 by
construction). Absorption commits (the amortized fold of accumulated
deltas into a new base) are reported separately by the tool — that is the
LSM-style cost the design pays instead of O(state) every round; in the
extreme-churn regime of THIS bench (cap ≈ corpus, recrawl=0) the store
auto-degrades to exactly one full write per round, the same as
copy-on-write, never worse.
"""
    fs_path = os.path.join(REPO, "BENCH", "fetch_stage_scaling.json")
    if os.path.exists(fs_path):
        with open(fs_path) as f:
            fs = json.load(f)
        lvl = fs["levels"]
        keys = sorted(lvl, key=int)
        md += f"""
## Data-plane (fetch/extract stage) scaling

`tools/bench_fetch_stage.py` — the per-round data plane alone (corpus join →
extraction UDF → candidate pipeline → validation UDF → budget pass → button
re-assembly) on a fixed {fs['n']}-URL fetch set, same pinning protocol,
best-of-reps after warm-up:

| level | best sec | URLs/s |
|---|---|---|
"""
        for k in keys:
            md += (f"| local[{k}] | {lvl[k]['best']} | "
                   f"{lvl[k]['urls_per_sec']} |\n")
        md += (f"\nFetch-stage scaling efficiency: "
               f"**{fs['fetch_stage_scaling_efficiency']}**. This is the\n"
               f"part of the round that is pure distributed data-plane work "
               f"(what a 1000-executor\ncluster replicates); the end-to-end "
               f"number above additionally carries the\nper-round "
               f"control-plane floor, which amortizes at production round "
               f"sizes\n(millions of URLs/round at the 10^10-frontier "
               f"design point).\n")
    # hand-maintained analysis (gate status, round-over-round narrative)
    # lives in BENCH/NOTES.md — linked, not inlined, so there is exactly
    # one copy of the narrative to keep honest
    md += ("\n## Analysis\n\nGate status, trajectory, noise measurements "
           "and round-over-round narrative:\nsee [BENCH/NOTES.md](NOTES.md) "
           "(hand-maintained, the single source of truth\nfor "
           "interpretation; this file holds the generated measured "
           "sections).\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
