"""Floor-attribution probe: run the crawl at a moderate cap on two pinned
parallelism levels and print per-round SUB-STAGE timings (rounds.py emits
dot-keys per eager action). Constant-across-cores sub-marks are the
control-plane floor the N->4N gate pays; scaling ones are data plane.
Not part of the official gate protocol (tools/bench_scaling.py) — this is
the diagnosis loop for deciding WHERE to shave.

Usage: python tools/floor_probe.py [--cores 16,4] [--hosts 20000]
       [--pph 12] [--cap 200000] [--rounds 8]
"""
import argparse, json, os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import run_level  # noqa: E402
import bench  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--cores", default="16,4")
ap.add_argument("--hosts", type=int, default=20000)
ap.add_argument("--pph", type=int, default=12)
ap.add_argument("--cap", type=int, default=200000)
ap.add_argument("--rounds", type=int, default=8)
args = ap.parse_args()

bench.CRAWL_HOSTS = args.hosts
bench.CRAWL_PAGES_PER_HOST = args.pph
bench.CRAWL_FANOUT = 100
corpus_dir, seed = bench._bench_corpus_dir()
out = {}
for cores in (int(c) for c in args.cores.split(",")):
    rows = run_level(cores, corpus_dir, seed, args.rounds, args.cap,
                     0, 15, timeout=7200)
    out[cores] = rows
    for r in rows:
        t = r["timing"]
        subs = {k: v for k, v in sorted(t.items()) if "." in k}
        coarse = {k: v for k, v in t.items() if "." not in k}
        print(f"[{cores}c] {r['fetched']:>7} urls {r['sec']:>7.1f}s "
              f"{coarse}", flush=True)
        print(f"        subs: {subs}", flush=True)
with open(os.path.join(REPO, "_data", "floor_probe.json"), "w") as f:
    json.dump(out, f)
