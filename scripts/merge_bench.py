#!/usr/bin/env python
"""Merge two (or more) ``bench_detail.json`` runs into one de-noised
detail file — the cross-RUN half of the calibration noise rule
(round-16 VERDICT #2).

Round 16's diagnosis: this host suffers intermittent co-tenant bursts
that inflate a different random ~10% of queries 5-20x per run. The
committed fix for the sf0.1 sweep was "per-query min of per-run
medians across two runs" — but it was applied by hand and only to the
sweep, so two single-shot sf1 rails (q18 10.8x vs 1.9x on unchanged
code) were committed contaminated. This script mechanizes the rule and
applies it to EVERY timing section, so the calibration workflow is:

    python bench.py                       # run 1 -> bench_detail.json
    cp bench_detail.json /tmp/run1.json
    python bench.py                       # run 2 -> bench_detail.json
    python scripts/merge_bench.py /tmp/run1.json bench_detail.json
    python scripts/refresh_budgets.py     # snapshot + budgets

Min — not mean — of medians is correct here because the noise is
strictly additive (a co-tenant burst only ever ADDS wall time); the
fastest median observed across runs is the closest measurement of the
plan's true cost. Ratios (sf1/base, fresh/base) are recomputed from
the merged numerators and denominators, never min-merged themselves —
min(a)/min(b) is the honest ratio; min(a/b) could pair a lucky
numerator with an unlucky denominator from different runs.

Writes the merged detail over ``--out`` (default: the repo's
``bench_detail.json``) with ``merged_from``/``merge_rule`` provenance
keys; per-query samples from all runs are concatenated so the spread
stays inspectable.
"""

from __future__ import annotations

import argparse
import json
import statistics
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: scalar per-query timing maps that min-merge across runs
MIN_MERGE_KEYS = (
    "queries",
    "compile_sec",
    "construct_sec",
    "cold_wall_sec",
    "sf1_flagships",
    "sf1_fresh_flagships",
)
#: per-query sample-list maps that concatenate across runs
CONCAT_KEYS = ("samples", "sf1_samples", "sf1_fresh_samples")

MERGE_RULE = "per-query min of per-run medians; ratios recomputed from merged timings"


def _min_merge(runs: list[dict], key: str) -> dict:
    out: dict[str, float] = {}
    for run in runs:
        for q, t in (run.get(key) or {}).items():
            if q == "error" or not isinstance(t, (int, float)):
                continue  # the {"error": -1.0} failed-probe marker
            out[q] = min(out[q], t) if q in out else t
    return {q: out[q] for q in sorted(out)}


def _concat(runs: list[dict], key: str) -> dict:
    out: dict[str, list] = {}
    for run in runs:
        for q, ts in (run.get(key) or {}).items():
            out.setdefault(q, []).extend(ts)
    return {q: out[q] for q in sorted(out)}


def _ratios(num: dict, den: dict) -> dict:
    return {
        q: (round(t / den[q], 1) if den.get(q) else None)
        for q, t in sorted(num.items())
    }


def merge(runs: list[dict]) -> dict:
    sfs = {run.get("sf") for run in runs}
    if len(sfs) != 1:
        raise SystemExit(f"refusing to merge runs at different sf: {sfs}")
    merged = dict(runs[0])  # non-timing keys (sf, ann diag, probes): run 1
    for key in MIN_MERGE_KEYS:
        m = _min_merge(runs, key)
        if m or key in merged:
            merged[key] = m
    for key in CONCAT_KEYS:
        c = _concat(runs, key)
        if c or key in merged:
            merged[key] = c
    merged["value"] = round(sum(merged["queries"].values()), 3)
    merged["n_queries"] = len(merged["queries"])
    merged["sf1_ratio"] = _ratios(
        merged.get("sf1_flagships") or {}, merged["queries"]
    )
    merged["sf1_fresh_ratio"] = _ratios(
        merged.get("sf1_fresh_flagships") or {}, merged["queries"]
    )
    merged["merge_rule"] = MERGE_RULE
    merged["merged_n_runs"] = len(runs)
    # per-run medians kept for the spread report: how much noise did
    # the min-merge remove?
    merged["merged_run_totals"] = [
        round(sum(v for v in (run.get("queries") or {}).values()), 3)
        for run in runs
    ]
    return merged


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("runs", nargs="+", help="bench_detail.json files (2+)")
    ap.add_argument("--out", default=str(ROOT / "bench_detail.json"))
    args = ap.parse_args()
    if len(args.runs) < 2:
        ap.error("need at least two runs to merge")
    runs = [json.loads(Path(p).read_text()) for p in args.runs]
    merged = merge(runs)
    merged["merged_from"] = [Path(p).name for p in args.runs]
    Path(args.out).write_text(json.dumps(merged, indent=1, sort_keys=True))
    print(
        "merged {} runs (totals {}) -> {} total {}s, {} sf1 rails, "
        "{} fresh rails".format(
            len(runs),
            merged["merged_run_totals"],
            Path(args.out).name,
            merged["value"],
            len(merged.get("sf1_flagships") or {}),
            len(merged.get("sf1_fresh_flagships") or {}),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
