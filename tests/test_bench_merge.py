"""The cross-run calibration merge (scripts/merge_bench.py) and the
scratch-dir rmtree guard (bench._safe_reset_scratch) — round-16
VERDICT #2 and ADVICE #4.

The merge rule is load-bearing for every committed sf1 rail: min of
per-run medians (co-tenant noise is strictly additive), ratios
recomputed from merged timings (min(a)/min(b), never min(a/b)).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _load(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, ROOT / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_min_of_medians_and_recomputed_ratios():
    mb = _load("merge_bench", "scripts/merge_bench.py")
    run1 = {
        "sf": 0.1,
        "queries": {"qa": 1.0, "qb": 9.0},  # qb spiked in run 1
        "compile_sec": {"qa": 0.2},
        "construct_sec": {"qa": 0.1},
        "cold_wall_sec": {"qa": 1.5, "qb": 9.5},
        "samples": {"qa": [1.0, 1.1], "qb": [9.0, 9.2]},
        "sf1_flagships": {"qa": 12.0},  # spiked sf1 rail in run 1
        "sf1_fresh_flagships": {"qa": 3.0},
        "sf1_samples": {"qa": [12.0]},
        "reps": 3,
    }
    run2 = {
        "sf": 0.1,
        "queries": {"qa": 1.2, "qb": 2.0},  # qa slightly slower in run 2
        "compile_sec": {"qa": 0.3},
        "construct_sec": {"qa": 0.1},
        "cold_wall_sec": {"qa": 1.4, "qb": 2.5},
        "samples": {"qa": [1.2], "qb": [2.0]},
        "sf1_flagships": {"qa": 4.0},
        "sf1_fresh_flagships": {"qa": 2.8},
        "sf1_samples": {"qa": [4.0]},
        "reps": 3,
    }
    m = mb.merge([run1, run2])
    # per-query min of per-run medians, independently per query
    assert m["queries"] == {"qa": 1.0, "qb": 2.0}
    assert m["sf1_flagships"] == {"qa": 4.0}
    assert m["sf1_fresh_flagships"] == {"qa": 2.8}
    assert m["cold_wall_sec"] == {"qa": 1.4, "qb": 2.5}
    # ratios recomputed from MERGED numerator and denominator
    assert m["sf1_ratio"]["qa"] == round(4.0 / 1.0, 1)
    assert m["sf1_fresh_ratio"]["qa"] == round(2.8 / 1.0, 1)
    # total re-summed from merged per-query numbers
    assert m["value"] == pytest.approx(3.0)
    assert m["n_queries"] == 2
    # samples concatenated so the spread stays inspectable
    assert m["samples"]["qa"] == [1.0, 1.1, 1.2]
    assert m["merged_n_runs"] == 2
    assert m["merged_run_totals"] == [10.0, 3.2]


def test_merge_refuses_mixed_sf_and_skips_error_markers():
    mb = _load("merge_bench", "scripts/merge_bench.py")
    with pytest.raises(SystemExit):
        mb.merge([{"sf": 0.1, "queries": {}}, {"sf": 0.01, "queries": {}}])
    # a failed sf1 probe writes {"error": -1.0}; the marker must not
    # min-merge into (or poison) the good run's rails
    good = {"sf": 0.1, "queries": {"qa": 1.0}, "sf1_flagships": {"qa": 2.0}}
    failed = {"sf": 0.1, "queries": {"qa": 1.1}, "sf1_flagships": {"error": -1.0}}
    m = mb.merge([good, failed])
    assert m["sf1_flagships"] == {"qa": 2.0}
    assert "error" not in m["sf1_ratio"]


def test_safe_reset_scratch_refuses_non_scratch_dir(tmp_path):
    bench = _load("bench_mod", "bench.py")
    # a dir holding anything unexpected must survive untouched
    keep = tmp_path / "precious"
    keep.mkdir()
    (keep / "thesis.txt").write_text("do not delete")
    with pytest.raises(RuntimeError, match="refusing to delete"):
        bench._safe_reset_scratch(str(keep))
    assert (keep / "thesis.txt").exists()
    # a genuine scratch layout (table parquet dirs + marker) is removed
    scratch = tmp_path / "scratch"
    (scratch / "documents.parquet").mkdir(parents=True)
    (scratch / "documents.parquet" / "_SUCCESS").touch()
    (scratch / "_BUILD_COMPLETE").touch()
    bench._safe_reset_scratch(str(scratch))
    assert not scratch.exists()
    # nonexistent path: no-op
    bench._safe_reset_scratch(str(tmp_path / "nope"))


def test_committed_calibration_carries_merge_provenance():
    """Ratchet: once the two-run rule ships, the committed calibration
    must say which runs it came from — a single-run snapshot of the
    sf1 rails is exactly the round-16 defect. Skips until the first
    merged calibration is committed this round."""
    cal = ROOT / "bench_calibration.json"
    if not cal.exists():
        pytest.skip("no calibration committed")
    doc = json.loads(cal.read_text())
    if "merge_rule" not in doc:
        pytest.skip("pre-merge-era calibration (r16); r17 recommit pending")
    assert doc["merged_n_runs"] >= 2
    assert "min of per-run medians" in doc["merge_rule"]
    # the sf1 rails must have gone through the same merge: present in
    # the merged doc, with samples recorded for spread inspection
    assert doc.get("sf1_flagships")
    assert doc.get("sf1_samples")
    assert doc.get("sf1_fresh_flagships")


def test_merge_properties_idempotent_and_monotone():
    """Property contract of the min-merge: merging a run with itself
    is the identity on every timing map; merged timings never exceed
    any contributing run's; merge is order-insensitive."""
    from hypothesis import given, settings, strategies as st

    mb = _load("merge_bench_prop", "scripts/merge_bench.py")

    t = st.floats(min_value=0.001, max_value=100, allow_nan=False)
    qmap = st.dictionaries(
        st.sampled_from(["qa", "qb", "qc"]), t.map(lambda x: round(x, 3)),
        min_size=1,
    )

    @settings(max_examples=50, deadline=None)
    @given(qmap, qmap)
    def check(m1, m2):
        r1 = {"sf": 0.1, "queries": m1, "sf1_flagships": dict(m1)}
        r2 = {"sf": 0.1, "queries": m2, "sf1_flagships": dict(m2)}
        self_merged = mb.merge([r1, dict(r1)])
        assert self_merged["queries"] == dict(sorted(m1.items()))
        ab = mb.merge([r1, r2])
        ba = mb.merge([r2, r1])
        assert ab["queries"] == ba["queries"]
        for q, v in ab["queries"].items():
            assert v <= m1.get(q, float("inf"))
            assert v <= m2.get(q, float("inf"))
            assert v == min(m1.get(q, float("inf")), m2.get(q, float("inf")))

    check()
