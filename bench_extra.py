"""Measurement-only companion to bench.py (guide §1: measure first).

NOT part of the driver contract — bench.py is frozen; this file exists so
optimization rounds can (a) time each headline query in isolation with the
same count() methodology bench.py uses, (b) dump .explain("formatted") for
the plan evidence in plans/r07/, and (c) attribute wall time to Spark
stages via the event log (the UI is disabled in the canonical session).

Usage:
    python bench_extra.py --queries g2_pagerank,dedup_ngram_jaccard --reps 3
    python bench_extra.py --all --reps 1 --explain plans/r07 --suffix _before
    python bench_extra.py --crawl            # crawl rounds w/ stage timing
    python bench_extra.py --parse-events     # summarize last event log
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EVENT_DIR = "/tmp/spark-events"

HEADLINE = [
    "g2_pagerank", "t2_threshold_topk", "t3_per_host_budget",
    "j2_admission_antijoin", "j4_redirect_chain", "g4_group_collect",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "ann_cosine_topk", "ann_ivf_assign",
    "ann_ivf_bucket_stats", "text_quality", "text_lang_id",
    "text_fingerprint", "mm_decode_features",
]


def _session(cpus: int):
    from x227f_spark.session import get_spark

    os.makedirs(EVENT_DIR, exist_ok=True)
    return get_spark(cores=cpus, app_name="x227f_bench_extra", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file:{EVENT_DIR}",
    })


def run_queries(spark, sf_dir, names, reps, explain_dir=None, suffix=""):
    import __spark_entry__ as entry_mod
    from x227f_spark.operators.qcache import release_caches

    qs = entry_mod.queries()
    out = {}
    # same warm-up as bench.py so rep-1 numbers are comparable
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .limit(1000).selectExpr("count(*)").collect()
    for name in names:
        times = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#rep{rep}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            n = df.count()
            times.append(round(time.monotonic() - t0, 3))
            # each rep pays the full cost: drop intra-suite caches between
            # reps (matches a cold driver run more closely than rep reuse)
            release_caches()
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"  {name}: {times} ({n} rows)", file=sys.stderr)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"),
                      "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            release_caches()
    return out


def run_crawl(spark):
    import bench as bench_mod

    spark.sparkContext.setJobDescription("crawl")
    stats = bench_mod.bench_crawl(spark)
    print(json.dumps(stats), file=sys.stderr)
    return stats


def run_crawl_timed(spark):
    """Crawl rounds with the engine's per-stage timing marks printed."""
    import tempfile

    import bench as bench_mod
    from x227f_spark.constants import EngineConfig
    from x227f_spark.plans.rounds import CrawlEngine

    corpus_dir, seed_url = bench_mod._bench_corpus_dir()
    state_dir = tempfile.mkdtemp(
        prefix="bx_state_", dir=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "_data"))
    cfg = EngineConfig(starting_point=seed_url,
                       fetch_cap=bench_mod.CRAWL_FETCH_CAP)
    eng = CrawlEngine(spark, corpus_dir, state_dir, config=cfg)
    rounds = []
    for i in range(bench_mod.CRAWL_ROUNDS):
        spark.sparkContext.setJobDescription(f"crawl round {i + 1}")
        t0 = time.monotonic()
        m = eng.run_round()
        wall = round(time.monotonic() - t0, 2)
        rounds.append({"round": m["round"], "wall": wall,
                       "admitted": m["admitted"], "fetched": m["fetched"],
                       "timing": eng.last_timing})
        print(json.dumps(rounds[-1]), file=sys.stderr)
    shutil.rmtree(state_dir, ignore_errors=True)
    return rounds


def parse_events(path=None):
    """Aggregate stage wall time per job description from the newest event
    log. Stage time here = completion - submission (includes scheduling),
    summed per stage; overlapping stages double-count wall but still rank
    where the time goes."""
    logs = sorted((os.path.join(EVENT_DIR, f) for f in os.listdir(EVENT_DIR)
                   if not f.startswith(".")), key=os.path.getmtime)
    path = path or (logs[-1] if logs else None)
    if not path:
        print("no event logs", file=sys.stderr)
        return
    if os.path.isdir(path):  # Spark 4 rolling event log dir
        parts = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.startswith("events_") or f.startswith("appstatus_"))
        parts = [p for p in parts if os.path.basename(p).startswith("events_")]
        path = parts[-1] if parts else path
    job_desc = {}       # jobId -> description
    stage_job = {}      # stageId -> jobId
    per_desc = {}       # description -> [total_sec, n_stages]
    stages = []         # (sec, desc, stageId, name, numTasks)
    if path.endswith(".zstd"):
        import io
        import subprocess
        raw = subprocess.run(["zstd", "-dc", path], capture_output=True,
                             check=True).stdout
        f = io.StringIO(raw.decode())
    else:
        f = open(path)
    with f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "<none>")
                job_desc[jid] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                sec = (comp - sub) / 1000.0
                desc = job_desc.get(stage_job.get(si["Stage ID"]), "<none>")
                agg = per_desc.setdefault(desc, [0.0, 0])
                agg[0] += sec
                agg[1] += 1
                stages.append((sec, desc, si["Stage ID"],
                               si.get("Stage Name", ""),
                               si.get("Number of Tasks", 0)))
    print(f"== event log: {path}")
    print("== per-description stage-time totals ==")
    for desc, (tot, n) in sorted(per_desc.items(), key=lambda kv: -kv[1][0]):
        print(f"  {tot:8.2f}s  {n:4d} stages  {desc}")
    print("== slowest 40 stages ==")
    for sec, desc, sid, name, ntasks in sorted(stages, reverse=True)[:40]:
        print(f"  {sec:7.2f}s  stage {sid:4d} ({ntasks:4d} tasks) "
              f"[{desc}] {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--crawl", action="store_true")
    ap.add_argument("--crawl-timed", action="store_true")
    ap.add_argument("--parse-events", action="store_true")
    ap.add_argument("--keep-session", action="store_true")
    args = ap.parse_args()

    if args.parse_events:
        parse_events()
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus)
    result = {}
    names = HEADLINE if args.all else [q for q in args.queries.split(",") if q]
    if names:
        result["queries"] = run_queries(
            spark, sf_dir, names, args.reps,
            explain_dir=args.explain or None, suffix=args.suffix)
    if args.crawl:
        result["crawl"] = run_crawl(spark)
    if args.crawl_timed:
        result["crawl"] = run_crawl_timed(spark)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
