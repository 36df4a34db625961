#!/usr/bin/env python
"""Regenerate ``bench_budgets.json`` from the latest local
``bench_detail.json`` medians (round-11 VERDICT "Next round" #2).

Rule (unchanged since round 10): ``budget = 2*t + 0.3`` — twice the
measured median plus a 0.3 s absolute grace, because sub-second
queries are scheduler-jitter-dominated on a busy local[32] host.

Run this TOGETHER with ``scripts/rotate_window.py`` at the top of each
round so rotation and budget refresh are one step:

    python scripts/rotate_window.py            # regenerate PRIORITY
    python scripts/refresh_budgets.py          # regenerate budgets
    python scripts/refresh_budgets.py --check  # CI-style drift check

``--check`` exits 1 when the committed budgets do not cover every
query in ``bench_detail.json`` or were derived with a different rule —
the same comparison ``tests/test_bench_budgets.py`` makes.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

RULE = "2*t + 0.3"


def derive(detail: dict) -> dict:
    budgets = {
        q: round(2 * t + 0.3, 3) for q, t in sorted(detail["queries"].items())
    }
    # sf1 scale rail (round-11 VERDICT #8): the 10x-data wall-clock
    # ratio is the early warning for super-linear cliffs — breach at
    # 1.5x the recorded ratio (+0.5 absolute grace for sub-linear
    # queries whose ratios are jitter-dominated).
    sf1 = {
        q: round(1.5 * r + 0.5, 2)
        for q, r in sorted((detail.get("sf1_ratio") or {}).items())
        if r is not None
    }
    return {
        "_comment": (
            "Per-query wall-clock budgets at sf{}: 2x the latest local "
            "bench_detail.json medians plus a 0.3 s absolute grace "
            "(sub-second queries are scheduler-jitter-dominated locally; "
            "see .claude verify notes). tests/test_bench_budgets.py flags "
            "breaches from the latest local bench_detail.json run; "
            "regenerate with scripts/refresh_budgets.py when a "
            "slower-but-better plan ships.".format(detail["sf"])
        ),
        "sf": detail["sf"],
        "source": "bench_detail.json",
        "rule": RULE,
        "budgets_sec": budgets,
        "sf1_ratio_rule": "1.5*r + 0.5",
        "sf1_ratio_budgets": sf1,
    }


def main(argv: list[str]) -> int:
    detail = json.loads((ROOT / "bench_detail.json").read_text())
    doc = derive(detail)
    out = ROOT / "bench_budgets.json"
    if "--check" in argv:
        committed = json.loads(out.read_text())
        missing = set(doc["budgets_sec"]) - set(committed.get("budgets_sec", {}))
        if committed.get("rule") != RULE or missing:
            print(
                "budget drift: rule={!r} missing={}".format(
                    committed.get("rule"), sorted(missing)[:5]
                )
            )
            print("regenerate with: python scripts/refresh_budgets.py")
            return 1
        print("budgets cover all {} measured queries".format(len(doc["budgets_sec"])))
        return 0
    out.write_text(json.dumps(doc, indent=2) + "\n")
    print("wrote {} budgets to {}".format(len(doc["budgets_sec"]), out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
