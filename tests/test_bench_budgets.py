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


def sf1_breaches(detail: dict, budget_doc: dict) -> list[tuple[str, float, float]]:
    """(query, measured ratio, budget ratio) rows where the sf1/sf0.1
    wall-clock ratio exceeds its rail — the early warning for
    super-linear scale cliffs (round-11 VERDICT #8)."""
    budgets = budget_doc.get("sf1_ratio_budgets") or {}
    ratios = detail.get("sf1_ratio") or {}
    return [
        (q, ratios[q], budgets[q])
        for q in sorted(set(ratios) & set(budgets))
        if ratios[q] is not None and ratios[q] > budgets[q]
    ]


def test_sf1_rail_flags_simulated_quadratic_blowup():
    """The sf1 checker itself: the recorded ratios pass their own
    rails; a simulated quadratic blowup (ratio -> ratio^2, i.e. 10x
    data costing 100x where it cost 10x) is flagged for every
    query whose recorded ratio exceeds ~1.8 (r^2 > 1.5r + 0.5 only for
    r > (1.5 + sqrt(4.25))/2 ~ 1.78; below that, near-linear queries
    sit in jitter territory by design)."""
    doc = load_budgets()
    base = json.loads((ROOT / "bench_detail.json").read_text())
    if not (doc.get("sf1_ratio_budgets") and base.get("sf1_ratio")):
        pytest.skip("no sf1 ratios recorded in this bench run")
    assert sf1_breaches(base, doc) == []
    blown = {
        "sf1_ratio": {q: r * r for q, r in base["sf1_ratio"].items() if r}
    }
    flagged = {q for q, _, _ in sf1_breaches(blown, doc)}
    material = {q for q, r in base["sf1_ratio"].items() if r and r >= 1.8}
    assert material and material <= flagged


def test_latest_sf1_ratios_within_rails():
    """The live sf1 rail: the most recent bench run's 10x-data ratios
    must sit inside every recorded rail."""
    detail_path = ROOT / "bench_detail.json"
    if not detail_path.exists():
        pytest.skip("no local bench_detail.json — run `python bench.py`")
    detail = json.loads(detail_path.read_text())
    doc = load_budgets()
    if not (doc.get("sf1_ratio_budgets") and detail.get("sf1_ratio")):
        pytest.skip("no sf1 ratios in this bench run")
    got = sf1_breaches(detail, doc)
    assert not got, (
        "sf1 scale-rail breaches (query, ratio, rail): "
        f"{got} — a super-linear regression; find the new shuffle or "
        "expansion before regenerating rails"
    )


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
