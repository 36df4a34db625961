#!/usr/bin/env python
"""Regenerate ``bench_budgets.json`` + ``bench_calibration.json`` from
the latest local ``bench_detail.json`` (round-12 VERDICT #2/#3/#4).

Outputs (BOTH committed — the pytest ratchets read only committed
state, so the suite is green at every commit and a post-commit driver
bench run cannot flip it red):

- ``bench_calibration.json`` — a verbatim copy of the clean
  ``bench_detail.json`` this refresh derived from (the gating tests'
  baseline).
- ``bench_budgets.json`` — per-query budgets and scale rails.

Rules (round-12 recalibration):

- wall budget  = max(2*t_clean, 1.4*t_driver) + 0.3 s — the driver
  floor absorbs cold-start/contention inflation the driver's
  post-commit runs carry (q_para_dedup was adjudicated noise at 1.68 s
  against a 0.998 s clean-run budget);
- sf1 rail     = 1.5*max(r_clean, r_driver) + 0.5 — driver-run ratios
  are the honest ones for output-bound queries
  (q_dedup_minhash_lsh measured 8.8–9.2 across driver rounds vs a 5.2
  clean-run calibration);
- compile rail = 2*c_clean + 1.0 s — plan-COMPILE time per query
  (round-12 VERDICT #5: q_feature_hashing spent 36.5 s in Catalyst for
  3.6 s of execution and no wall budget flagged it).

Driver floors come from the committed ``bench_driver_detail.json``
(the latest driver bench run, snapshotted at rotation). Queries listed
in ``artifacts_manifest.json``'s ``driver_floor_exclude`` take the
clean number only — the documented escape hatch for a query whose
plan was DELIBERATELY made faster after the driver run measured the
old plan.

Run TOGETHER with ``scripts/rotate_window.py`` at the top of each
round:

    python scripts/rotate_window.py            # rotate + bump manifest
    python bench.py && cp bench_detail.json /tmp/run1.json
    python bench.py                            # second run (noise rule)
    python scripts/merge_bench.py /tmp/run1.json bench_detail.json
    python scripts/refresh_budgets.py          # regenerate budgets
    python scripts/refresh_budgets.py --check  # CI-style drift check

``--check`` exits 1 when the committed budgets do not cover every
registered query or were derived with a different rule.
``--check-live`` exits 1 on breaches of the CURRENT (possibly
uncommitted) ``bench_detail.json`` against the committed budgets —
the builder's live ratchet after a plan change; pytest only warns on
live breaches because a bench run the builder did not perform (the
driver's, with parity sweeps sharing the JVM) must not gate the tree.
``--measure q_a,q_b`` times just the named queries (3-rep median at
the budget sf) and merges them into the calibration + budgets — the
cheap path for budgeting a freshly registered operator without a full
269-query bench.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

RULE = "max(2*t_clean, 1.4*t_driver) + 0.3"
SF1_RULE = "1.5*max(r_clean, r_driver) + 0.5"
COMPILE_RULE = "2*c_clean + 1.0"
# the fresh-content dedup rail has no driver twin (the driver benches
# only the shipped sf dirs), so its rail derives from the clean run only
SF1_FRESH_RULE = "1.5*r_clean + 0.5"
# cold (construct-inclusive) wall: the driver's single-shot number IS a
# cold wall for artifact-backed queries, so the driver floor applies
COLD_RULE = "max(2*c_clean, 1.4*t_driver) + 0.3"


def driver_floor_exclusions(root: Path = ROOT) -> set[str]:
    mp = root / "artifacts_manifest.json"
    if not mp.exists():
        return set()
    return set(json.loads(mp.read_text()).get("driver_floor_exclude", []))


def load_driver_detail(root: Path = ROOT) -> dict:
    p = root / "bench_driver_detail.json"
    return json.loads(p.read_text()) if p.exists() else {}


def derive(detail: dict, driver: dict, exclude: set[str]) -> dict:
    dq = driver.get("queries") or {}
    budgets = {}
    for q, t in sorted(detail["queries"].items()):
        td = 0.0 if q in exclude else dq.get(q, 0.0)
        budgets[q] = round(max(2 * t, 1.4 * td) + 0.3, 3)
    dr = driver.get("sf1_ratio") or {}
    sf1 = {}
    for q, r in sorted((detail.get("sf1_ratio") or {}).items()):
        if r is None:
            continue
        rd = 0.0 if q in exclude else (dr.get(q) or 0.0)
        sf1[q] = round(1.5 * max(r, rd) + 0.5, 2)
    compile_budgets = {
        q: round(2 * c + 1.0, 3)
        for q, c in sorted((detail.get("compile_sec") or {}).items())
    }
    sf1_fresh = {
        q: round(1.5 * r + 0.5, 2)
        for q, r in sorted((detail.get("sf1_fresh_ratio") or {}).items())
        if r is not None
    }
    cold_budgets = {}
    for q, c in sorted((detail.get("cold_wall_sec") or {}).items()):
        td = 0.0 if q in exclude else dq.get(q, 0.0)
        cold_budgets[q] = round(max(2 * c, 1.4 * td) + 0.3, 3)
    return {
        "_comment": (
            "Per-query wall-clock budgets at sf{}: committed ratchet "
            "baselines derived from bench_calibration.json (a clean "
            "local bench run) with driver-run floors from "
            "bench_driver_detail.json (driver benches carry cold-start "
            "and sweep-contention inflation a clean run does not). "
            "tests/test_bench_budgets.py gates on the committed "
            "calibration; live (uncommitted) bench_detail.json runs "
            "surface as warnings and via "
            "`scripts/refresh_budgets.py --check-live`. Regenerate with "
            "scripts/refresh_budgets.py when a slower-but-better plan "
            "ships.".format(detail["sf"])
        ),
        "sf": detail["sf"],
        "source": "bench_calibration.json",
        "driver_source": "bench_driver_detail.json",
        "driver_floor_exclude": sorted(exclude),
        "rule": RULE,
        "budgets_sec": budgets,
        "sf1_ratio_rule": SF1_RULE,
        "sf1_ratio_budgets": sf1,
        "sf1_fresh_ratio_rule": SF1_FRESH_RULE,
        "sf1_fresh_ratio_budgets": sf1_fresh,
        "compile_rule": COMPILE_RULE,
        "compile_budgets_sec": compile_budgets,
        "cold_wall_rule": COLD_RULE,
        "cold_wall_budgets_sec": cold_budgets,
    }


def measure(names: list[str], sf_dir: str, reps: int = 3) -> tuple[dict, dict]:
    """Time just ``names`` (median of ``reps``, plus a compile-time
    sample) the same way bench.py does — for merging late-registered
    queries into the calibration without a full bench."""
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.session import get_spark

    spark = get_spark(app_name="budget-measure", extra_conf={"spark.ui.enabled": "false"})
    queries = all_queries()
    timings: dict[str, float] = {}
    compiles: dict[str, float] = {}
    for name in names:
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            # compile = the optimizedPlan() wall ONLY (round-13 ADVICE):
            # construction may run one-time cached builds / diagnostic
            # collects that would swamp the Catalyst signal the rail
            # exists to detect
            t_built = time.perf_counter()
            df._jdf.queryExecution().optimizedPlan()
            if i == 0:
                compiles[name] = round(time.perf_counter() - t_built, 3)
            df.count()
            ts.append(round(time.perf_counter() - t0, 3))
        timings[name] = round(statistics.median(ts), 3)
    spark.stop()
    return timings, compiles


def main(argv: list[str]) -> int:
    cal_path = ROOT / "bench_calibration.json"
    out = ROOT / "bench_budgets.json"
    exclude = driver_floor_exclusions()
    driver = load_driver_detail()

    if "--check" in argv:
        from dynamodb_streaming_datalake_spark.registry import all_queries

        committed = json.loads(out.read_text())
        missing = set(all_queries()) - set(committed.get("budgets_sec", {}))
        if committed.get("rule") != RULE or missing:
            print(
                "budget drift: rule={!r} missing={}".format(
                    committed.get("rule"), sorted(missing)[:5]
                )
            )
            print("regenerate with: python scripts/refresh_budgets.py")
            return 1
        print(
            "budgets cover all {} registered queries".format(
                len(committed["budgets_sec"])
            )
        )
        return 0

    if "--check-live" in argv:
        live_path = ROOT / "bench_detail.json"
        if not live_path.exists():
            print("no bench_detail.json — run `python bench.py` first")
            return 1
        live = json.loads(live_path.read_text())
        doc = json.loads(out.read_text())
        bad = [
            (q, live["queries"][q], doc["budgets_sec"][q])
            for q in sorted(set(live.get("queries", {})) & set(doc["budgets_sec"]))
            if live["queries"][q] > doc["budgets_sec"][q]
        ]
        badc = [
            (q, live["compile_sec"][q], doc["compile_budgets_sec"][q])
            for q in sorted(
                set(live.get("compile_sec", {})) & set(doc.get("compile_budgets_sec", {}))
            )
            if live["compile_sec"][q] > doc["compile_budgets_sec"][q]
        ]
        # cold walls are single-shot by nature (rep 0 only), so their
        # breaches are informational — printed, never gating
        coldb = [
            (q, live["cold_wall_sec"][q], doc["cold_wall_budgets_sec"][q])
            for q in sorted(
                set(live.get("cold_wall_sec", {}))
                & set(doc.get("cold_wall_budgets_sec", {}))
            )
            if live["cold_wall_sec"][q] > doc["cold_wall_budgets_sec"][q]
        ]
        if coldb:
            print(f"cold-wall overruns (informational): {coldb}")
        if bad or badc:
            print(f"LIVE wall breaches (query, measured, budget): {bad}")
            print(f"LIVE compile breaches (query, measured, budget): {badc}")
            return 1
        print(f"live run within budgets ({len(live.get('queries', {}))} queries)")
        return 0

    if "--measure" in argv:
        names = argv[argv.index("--measure") + 1].split(",")
        detail = json.loads(cal_path.read_text())
        sf_dir = f"/root/testdata/sf{detail['sf']}"
        timings, compiles = measure(names, sf_dir)
        detail["queries"].update(timings)
        detail.setdefault("compile_sec", {}).update(compiles)
        cal_path.write_text(json.dumps(detail, indent=1, sort_keys=True))
        print(f"merged {timings} / compile {compiles} into {cal_path.name}")
    else:
        detail = json.loads((ROOT / "bench_detail.json").read_text())
        cal_path.write_text(json.dumps(detail, indent=1, sort_keys=True))
        print(f"calibration snapshot -> {cal_path.name}")

    doc = derive(detail, driver, exclude)
    out.write_text(json.dumps(doc, indent=2) + "\n")
    print(
        "wrote {} wall + {} sf1 + {} compile budgets to {}".format(
            len(doc["budgets_sec"]),
            len(doc["sf1_ratio_budgets"]),
            len(doc["compile_budgets_sec"]),
            out,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
