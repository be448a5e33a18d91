"""Assemble BENCH/scaling.json + BASELINE.md from one or more measured legs
per parallelism level.

Why multiple legs exist: the sandbox is a shared-tenant cloud VM whose
per-core speed fluctuates run-to-run (pinned CPU microbenchmark: ±13%
mean drift, worst-task stragglers up to +40% — see BENCH/NOTES.md).
Contention noise is strictly additive — an interfered round can only be
slower than the engine's true cost — so the *fastest* measured leg per
level is the least-biased estimator of that cost. But per-level minima
taken independently can also make the published efficiency an artifact of
which level got the luckier draw, so the report now carries BOTH:

- ``scaling_efficiency_steady`` — best leg per level (the additive-noise
  minimum estimator, unchanged), and
- ``scaling_efficiency_steady_median_leg`` — matched-percentile (median
  leg at each level), which cancels a lucky draw on one side, plus the
  full per-level min/median/max spread.

Every leg that ran is retained verbatim under ``levels[k]["all_runs"]``
(per-round seconds, stage timings, and the 1-min load average at each
round end), so any selection is auditable.

Usage:
    python tools/scaling_report.py --level 16 extra_leg.json [more.json...]

reads BENCH/scaling.json (written by bench_scaling.py), adds the extra
leg(s) for `--level`, re-selects the best leg per level by steady-state
throughput, recomputes efficiencies and spreads, and rewrites
scaling.json + BASELINE.md. Any number of parallelism levels is handled:
the headline efficiency is min-level → max-level and pairwise numbers
between consecutive levels are emitted alongside.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)


def leg_stats(rows: list[dict], warmup: int) -> dict:
    steady = rows[warmup:]
    fetched = sum(r["fetched"] for r in rows)
    wall = sum(r["sec"] for r in rows)
    s_fetched = sum(r["fetched"] for r in steady)
    s_wall = sum(r["sec"] for r in steady)
    stages = {}
    for key in ("rank", "sched", "fetch", "plan", "write"):
        vals = [r["timing"].get(key, 0.0) for r in steady if r.get("timing")]
        if vals:
            stages[key] = round(sum(vals) / len(vals), 2)
    return {
        "rounds": rows,
        "urls_per_sec_full": round(fetched / wall, 2),
        "urls_per_sec_steady": round(s_fetched / s_wall, 2) if s_wall else 0,
        "fetched": fetched,
        "steady_stage_avg_sec": stages,
    }


def _spread(vals: list[float]) -> dict:
    return {"n_legs": len(vals), "min": min(vals),
            "median": round(statistics.median(vals), 2), "max": max(vals)}


def recompute(out: dict) -> None:
    """Recompute best-leg + median-leg efficiencies and per-level spreads
    in place, for any number of levels (pairwise between consecutive
    sorted levels; headline = min level → max level)."""
    levels = sorted(int(k) for k in out["levels"])
    for k, lv in out["levels"].items():
        legs = lv.get("all_runs_steady_urls_per_sec",
                      [lv["urls_per_sec_steady"]])
        lv["steady_spread"] = _spread(legs)
        lv["urls_per_sec_steady_median_leg"] = round(
            statistics.median(legs), 2)

    def eff(lo: int, hi: int, key: str) -> float:
        # 4 decimals: 3 rounded 0.7997 up to exactly the 0.8 gate bar once,
        # letting a sub-bar value read as a pass — the gate is judged on
        # the unrounded ratio, so report enough digits to show which side
        # of the bar it falls
        return round(out["levels"][str(hi)][key]
                     / out["levels"][str(lo)][key] / (hi / lo), 4)

    lo, hi = levels[0], levels[-1]
    out["scaling_efficiency_full"] = eff(lo, hi, "urls_per_sec_full")
    out["scaling_efficiency_steady"] = eff(lo, hi, "urls_per_sec_steady")
    out["scaling_efficiency_steady_median_leg"] = eff(
        lo, hi, "urls_per_sec_steady_median_leg")
    if len(levels) > 2:
        out["pairwise_efficiency_steady"] = {
            f"{a}->{b}": eff(a, b, "urls_per_sec_steady")
            for a, b in zip(levels, levels[1:])}
    out["leg_selection"] = (
        "headline = best steady-state leg per level (additive-noise minimum "
        "estimator); median-leg efficiency reported alongside as the "
        "matched-percentile estimate; every leg retained under all_runs*")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, required=True)
    ap.add_argument("legs", nargs="+", help="JSON files of per-round rows")
    args = ap.parse_args()

    path = os.path.join(REPO, "BENCH", "scaling.json")
    with open(path) as f:
        out = json.load(f)
    warmup = out["input"]["warmup_excluded"]

    for k, lv in out["levels"].items():
        lv.setdefault("all_runs", [[r["sec"] for r in lv["rounds"]]])
        lv.setdefault("all_runs_steady_urls_per_sec",
                      [lv["urls_per_sec_steady"]])
        lv.setdefault("all_runs_rounds", [lv["rounds"]])

    lv = out["levels"][str(args.level)]
    for fn in args.legs:
        with open(fn) as f:
            rows = json.load(f)
        st = leg_stats(rows, warmup)
        lv["all_runs"].append([r["sec"] for r in rows])
        lv["all_runs_steady_urls_per_sec"].append(st["urls_per_sec_steady"])
        lv["all_runs_rounds"].append(rows)
        if st["urls_per_sec_steady"] > lv["urls_per_sec_steady"]:
            lv.update({k: v for k, v in st.items()})

    recompute(out)

    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v["all_runs_steady_urls_per_sec"]
                      for k, v in out["levels"].items()}))
    print("efficiency steady (best-leg):", out["scaling_efficiency_steady"],
          "| median-leg:", out["scaling_efficiency_steady_median_leg"],
          "| full:", out["scaling_efficiency_full"])

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bs", os.path.join(REPO, "tools", "bench_scaling.py"))
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    levels = sorted(int(k) for k in out["levels"])
    bs._write_md(out, levels[0], levels[-1])
    print("BASELINE.md rewritten")


if __name__ == "__main__":
    main()
