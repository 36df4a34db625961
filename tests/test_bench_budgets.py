"""Mechanized bench regression detection (round-10 VERDICT #8).

`bench_budgets.json` pins a per-query wall-clock budget (2x the
BENCH_r10 driver medians at sf0.1). The checker is a pure function so
the breach logic itself is testable; the integration test applies it
to the latest local `bench_detail.json` — so a plan regression goes
red locally BEFORE the driver's per-round bench records it — and
skips when no comparable (same-sf) local run exists, because budgets
at one scale factor say nothing about timings at another.
"""

from __future__ import annotations

import json
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def load_budgets() -> dict:
    return json.loads((ROOT / "bench_budgets.json").read_text())


def breaches(detail: dict, budget_doc: dict) -> list[tuple[str, float, float]]:
    """(query, measured, budget) rows where the measured median exceeds
    its budget. Queries without a budget (post-r10 additions) and
    budgets without a measurement (rotating headline set) are ignored
    — the ratchet only compares what both sides measured."""
    budgets = budget_doc["budgets_sec"]
    qs = detail.get("queries") or {}
    return [
        (q, qs[q], budgets[q])
        for q in sorted(set(qs) & set(budgets))
        if qs[q] > budgets[q]
    ]


def test_breach_logic_flags_simulated_slowdown():
    """The checker itself: the budget source's own numbers pass their
    budgets (2x + 0.3 s jitter grace); a simulated 3x slowdown is
    flagged for every query big enough that the grace term isn't the
    whole budget (sub-0.3 s queries are scheduler-noise-dominated
    locally — a 3x on 0.16 s is indistinguishable from a busy host,
    and the ratchet should not cry wolf there)."""
    doc = load_budgets()
    base = json.loads((ROOT / "bench_detail.json").read_text())
    assert breaches(base, doc) == []
    slow = {
        "sf": base["sf"],
        "queries": {q: 3 * t for q, t in base["queries"].items()},
    }
    flagged = {q for q, _, _ in breaches(slow, doc)}
    material = {q for q, t in base["queries"].items() if t >= 0.3}
    assert material and material <= flagged


def test_budgets_cover_every_measured_query():
    """Round-11 VERDICT #2: budgets must cover ALL queries in the
    latest bench_detail.json, not a 16-query headline subset — else
    235 queries can regress 10x without any local red. Regenerate with
    `python scripts/refresh_budgets.py` after each bench refresh."""
    detail_path = ROOT / "bench_detail.json"
    if not detail_path.exists():
        pytest.skip("no local bench_detail.json — run `python bench.py`")
    detail = json.loads(detail_path.read_text())
    doc = load_budgets()
    missing = set(detail.get("queries", {})) - set(doc["budgets_sec"])
    assert not missing, (
        f"{len(missing)} measured queries lack budgets (e.g. "
        f"{sorted(missing)[:5]}) — run scripts/refresh_budgets.py"
    )


def test_latest_local_bench_run_within_budgets():
    """The live ratchet: the most recent `python bench.py` run at the
    budget scale factor must sit inside every per-query budget."""
    detail_path = ROOT / "bench_detail.json"
    if not detail_path.exists():
        pytest.skip("no local bench_detail.json — run `python bench.py`")
    try:
        detail = json.loads(detail_path.read_text())
    except json.JSONDecodeError:
        pytest.skip("bench_detail.json is truncated (interrupted run)")
    doc = load_budgets()
    if detail.get("sf") != doc["sf"]:
        pytest.skip(
            f"local bench ran at sf={detail.get('sf')}, budgets are "
            f"for sf={doc['sf']}"
        )
    got = breaches(detail, doc)
    assert not got, (
        "bench budget breaches (query, measured s, budget s): "
        f"{got} — if the slowdown is a deliberate trade, regenerate "
        "bench_budgets.json and say why in the commit"
    )
