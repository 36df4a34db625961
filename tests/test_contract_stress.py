"""Contract-stress parity tier (round-16 VERDICT #4).

The driver found two genuine cross-engine bugs (q_pacf NULLing at 10x
value magnitude, q_hill_tail diverging on all-ties) that the standard
oracle gate could never catch: the shipped sf fixtures simply never
reach those inputs. Both were "fixtures never stress the declared
contract" defects. This tier generalizes the two ad-hoc pins in
test_oracle_parity.py into a systematic sweep: every decimal-kernel /
order-statistic query runs its FULL cross-engine comparison on mutated
sf dirs that push the declared contract —

- ``sf_mag``    events.value x3000 (≈8e14 decimal sums: every decimal
                cap in the repo must hold at 10x-bench magnitude);
- ``sf_ties``   events.value constant (all-ties: zero variance, one
                distinct value, p1 == p99, D == 0, sd == 0 paths);
- ``sf_onearm`` events.ts constant and BEFORE every split point
                (empty second arm / single day: empty-group division
                paths, self-join-over-one-point paths);
- ``sf_onetype`` events.event_type constant (single-group paths for
                grouped kernels and cross-group normalizers);
- ``sf_oneflag`` lineitem.l_returnflag constant 'N' (single-outcome
                supervision: WOE's empty bad cells must smooth, not
                NULL);
- ``sf_onestatus`` orders.o_orderstatus constant (degenerate 1xK
                contingency: Cramér's V's min(r,c)-1 == 0 path).

Parity — not any specific value — is the gate: whatever the engine
returns on a degenerate input, the oracle must return the same thing,
or the divergence gets a documented out-of-contract note (the q_pacf
precedent). Fixture dirs build once per session (pyarrow rewrite keeps
parquet TIMESTAMP(NANOS) physical types the oracle's casts rely on).
"""

from __future__ import annotations

import shutil

import pytest

from dynamodb_streaming_datalake_spark.registry import all_oracle_sql, all_queries
from dynamodb_streaming_datalake_spark.sources.readers import TABLES
from tests.oracle_utils import compare_query

QUERIES = all_queries()
ORACLE = all_oracle_sql()

SRC = "/root/testdata/sf0.001"


def _clone_sf(tmp, name, table, mutate):
    """Copy the sf0.001 tables into ``tmp/name``, rewriting one table
    through ``mutate(arrow_table)`` with pyarrow (a Spark round-trip
    would demote TIMESTAMP(NANOS) to BIGINT and break oracle casts)."""
    import pyarrow.parquet as pq

    dst = tmp / name
    dst.mkdir()
    for t in TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", dst / f"{t}.parquet")
    tbl = pq.read_table(f"{SRC}/{table}.parquet")
    pq.write_table(mutate(tbl), str(dst / f"{table}.parquet"))
    return str(dst)


@pytest.fixture(scope="session")
def stress_dirs(tmp_path_factory):
    """All six stress dirs, built once per session."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    tmp = tmp_path_factory.mktemp("contract_stress")

    def scale_value(tbl):
        i = tbl.schema.get_field_index("value")
        return tbl.set_column(
            i, "value", pc.multiply(tbl.column("value"), pa.scalar(3000.0))
        )

    def const_value(tbl):
        i = tbl.schema.get_field_index("value")
        return tbl.set_column(
            i, "value", pa.array([5.0] * len(tbl), type=pa.float64())
        )

    def const_ts(tbl):
        # one instant, before KS_SPLIT (2024-01-16) and every other
        # period split: second arm empty, a single observed day
        i = tbl.schema.get_field_index("ts")
        one = np.full(len(tbl), np.datetime64("2024-01-05T12:00:00", "ns"))
        return tbl.set_column(
            i, "ts", pa.array(one, type=tbl.schema.field("ts").type)
        )

    def const_type(tbl):
        i = tbl.schema.get_field_index("event_type")
        return tbl.set_column(
            i, "event_type", pa.array(["click"] * len(tbl), type=pa.string())
        )

    def const_flag(tbl):
        i = tbl.schema.get_field_index("l_returnflag")
        return tbl.set_column(
            i, "l_returnflag", pa.array(["N"] * len(tbl), type=pa.string())
        )

    def const_status(tbl):
        i = tbl.schema.get_field_index("o_orderstatus")
        return tbl.set_column(
            i, "o_orderstatus", pa.array(["O"] * len(tbl), type=pa.string())
        )

    def scale_price(tbl):
        # l_extendedprice x3000: the TPC-H revenue aggregates' decimal
        # caps at 10x-bench money magnitude
        i = tbl.schema.get_field_index("l_extendedprice")
        return tbl.set_column(
            i,
            "l_extendedprice",
            pc.multiply(tbl.column("l_extendedprice"), pa.scalar(3000.0)),
        )

    def null_value(tbl):
        # every metric value NULL: aggregates over zero non-null rows,
        # NULL percentiles, empty ECDFs — the all-dropped-sensor shape
        i = tbl.schema.get_field_index("value")
        return tbl.set_column(
            i, "value", pa.array([None] * len(tbl), type=pa.float64())
        )

    def negate_value(tbl):
        # all values strictly negative: log/sqrt/leading-digit paths
        i = tbl.schema.get_field_index("value")
        v = pc.subtract(pa.scalar(0.0), pc.abs(tbl.column("value")))
        return tbl.set_column(i, "value", pc.subtract(v, pa.scalar(1.0)))

    return {
        "sf_mag": _clone_sf(tmp, "sf_mag", "events", scale_value),
        "sf_ties": _clone_sf(tmp, "sf_ties", "events", const_value),
        "sf_onearm": _clone_sf(tmp, "sf_onearm", "events", const_ts),
        "sf_onetype": _clone_sf(tmp, "sf_onetype", "events", const_type),
        "sf_oneflag": _clone_sf(tmp, "sf_oneflag", "lineitem", const_flag),
        "sf_onestatus": _clone_sf(tmp, "sf_onestatus", "orders", const_status),
        "sf_nulls": _clone_sf(tmp, "sf_nulls", "events", null_value),
        "sf_negative": _clone_sf(tmp, "sf_negative", "events", negate_value),
        "sf_price": _clone_sf(tmp, "sf_price", "lineitem", scale_price),
        # a single surviving event row: every n-1 variance denominator,
        # single-sample std, one-point regression/series path
        "sf_onerow": _clone_sf(
            tmp, "sf_onerow", "events", lambda tbl: tbl.slice(0, 1)
        ),
    }


#: the events.value decimal-kernel / order-statistic family: full
#: parity at 10x magnitude AND under all-ties. q_pacf / q_hill_tail /
#: q_exact_quantile_twopass / q_grouped_weighted_quantile keep their
#: original dedicated pins in test_oracle_parity.py.
VALUE_KERNELS = (
    "q_winsorize",
    "q_effect_size",
    "q_jackknife_ratio",
    "q_theilsen_slope",
    "q_two_sample_ks",
    "q_mann_whitney",
    "q_event_moments",
    "q_user_value_deciles",
    "q_equidepth_histogram",
    "q_anomaly_zscore",
    "q_gini_coefficient",
    "q_mad_outliers",
    "q_histogram_drift",
    "q_drift_battery",
    "q_ab_test",
    "q_cuped",
    "q_standardization",
    "q_changepoint",
    "q_quantile_normalize",
    "q_autocorrelation",
    "q_holt_trend",
    "q_ewma_user_value",
    "q_seasonal_decompose",
    "q_interp_linear",
    "q_benford_audit",
    "q_histogram_value",
    "q_linreg_train",
    "q_linreg_cv",
    "q_grouped_forecast",
    "q_power_mde",
    "q_bootstrap_ci",
    # round-17 second sweep: the remaining events.value consumers with
    # decimal or order-statistic kernels
    "q_lift_deciles",
    "q_srm_check",
    "q_sprt_monitor",
    "q_conformal_calibrate",
    "q_bandit_posterior",
    "q_diff_in_diff",
    "q_ohlc_bars",
    "q_gap_fill_hourly",
    # round-17 causal/experiments registrations: all consume
    # events.value through decimal kernels
    "q_permutation_test",
    "q_cluster_robust_se",
    "q_ipw_ate",
    "q_matched_pairs",
    "q_regression_discontinuity",
    "q_quantile_treatment_effect",
)

#: time-axis kernels additionally stressed with a single observed
#: instant (empty second arm / single day / zero-lag series)
TIME_KERNELS = (
    "q_two_sample_ks",
    "q_mann_whitney",
    "q_theilsen_slope",
    "q_changepoint",
    "q_autocorrelation",
    "q_pacf",
    "q_seasonal_decompose",
    "q_holt_trend",
    "q_drift_battery",
    "q_histogram_drift",
    "q_cuped",
    "q_diff_in_diff",
    # round-17 second sweep: duration / bar / interpolation kernels
    # collapse to a single observed instant
    "q_survival_km",
    "q_sessionize",
    "q_ohlc_bars",
    "q_gap_fill_hourly",
    "q_sprt_monitor",
    # round-17: raking's day margin collapses to a single column
    "q_raking",
)

#: grouped kernels additionally stressed with a single group (the
#: cross-group normalizer / single-partition paths)
GROUP_KERNELS = (
    "q_winsorize",
    "q_effect_size",
    "q_jackknife_ratio",
    "q_theilsen_slope",
    "q_quantile_normalize",
    "q_drift_battery",
    "q_event_moments",
    "q_grouped_forecast",
    "q_standardization",
    # round-17: treatment/grouping collapses when event_type is
    # constant (no error events -> all-control; no purchases -> y = 0;
    # raking's row margin degenerates to one row)
    "q_permutation_test",
    "q_cluster_robust_se",
    "q_ipw_ate",
    "q_matched_pairs",
    "q_regression_discontinuity",
    "q_raking",
    "q_quantile_treatment_effect",
)

#: queries whose documented contract EXCLUDES a stress axis — each
#: entry needs a reason string; the sweep skips them loudly instead of
#: silently passing a weaker check. (Empty: every kernel currently
#: holds full parity on every axis it's swept on. The q_pacf
#: magnitude/onearm contract notes live in its docstring and its
#: dedicated pins.)
OUT_OF_CONTRACT: dict[tuple[str, str], str] = {}


def _sweep(spark, d, name):
    key = (name, d.rsplit("/", 1)[-1])
    if key in OUT_OF_CONTRACT:
        pytest.skip(f"documented out-of-contract: {OUT_OF_CONTRACT[key]}")
    compare_query(spark, d, name, QUERIES[name], ORACLE[name])


@pytest.mark.parametrize("name", VALUE_KERNELS)
def test_stress_magnitude(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_mag"], name)


@pytest.mark.parametrize("name", VALUE_KERNELS)
def test_stress_all_ties(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_ties"], name)


@pytest.mark.parametrize("name", VALUE_KERNELS)
def test_stress_all_null(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_nulls"], name)


@pytest.mark.parametrize("name", VALUE_KERNELS)
def test_stress_all_negative(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_negative"], name)


@pytest.mark.parametrize("name", VALUE_KERNELS)
def test_stress_single_row(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_onerow"], name)


@pytest.mark.parametrize("name", TIME_KERNELS)
def test_stress_one_arm(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_onearm"], name)


@pytest.mark.parametrize("name", GROUP_KERNELS)
def test_stress_one_group(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_onetype"], name)


@pytest.mark.parametrize("name", ("q_woe_iv",))
def test_stress_single_outcome(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_oneflag"], name)


#: revenue/money decimal kernels swept at 3000x l_extendedprice — the
#: TPC-H headline aggregates' caps at 10x-bench money magnitude
PRICE_KERNELS = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q15_top_supplier",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q_rfm_segments",
    "q_metric_bridge",
    "q_simpson_scan",
    "q_grouped_weighted_quantile",
    "q_topk_orders",
)


@pytest.mark.parametrize("name", PRICE_KERNELS)
def test_stress_price_magnitude(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_price"], name)


@pytest.mark.parametrize(
    "name", ("q_cramers_v", "q_fd_audit", "q_mutual_information")
)
def test_stress_degenerate_contingency(spark, stress_dirs, name):
    _sweep(spark, stress_dirs["sf_onestatus"], name)


# ---------------------------------------------------------------------------
# third axis (round 17, second half): degenerate documents / embeddings
# ---------------------------------------------------------------------------
@pytest.fixture(scope="session")
def doc_stress_dirs(tmp_path_factory):
    """sf_emptydoc: every documents.text is the empty string (empty
    shingle sets, zero token counts, zero-length division paths).
    sf_zerovec: every embedding is the zero vector (zero norms: every
    cosine/normalize kernel's division-by-zero path)."""
    import pyarrow as pa

    tmp = tmp_path_factory.mktemp("doc_stress")

    def empty_text(tbl):
        i = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(
            i, "text", pa.array([""] * len(tbl), type=pa.string())
        )
        j = tbl.schema.get_field_index("n_chars")
        return tbl.set_column(
            j, "n_chars", pa.array([0] * len(tbl), type=pa.int64())
        )

    def zero_vec(tbl):
        i = tbl.schema.get_field_index("embedding")
        col = tbl.column("embedding").combine_chunks()
        dim = len(col[0]) if len(col) else 0
        zeros = pa.array(
            [[0.0] * dim] * len(tbl), type=pa.list_(pa.float32())
        )
        return tbl.set_column(i, "embedding", zeros)

    return {
        "sf_emptydoc": _clone_sf(tmp, "sf_emptydoc", "documents", empty_text),
        "sf_zerovec": _clone_sf(tmp, "sf_zerovec", "embeddings", zero_vec),
    }


#: text/dedup kernels swept on the all-empty-text corpus: empty shingle
#: and token sets must produce the SAME empty/zero/NULL frames on both
#: engines, never a division error
EMPTY_DOC_KERNELS = (
    "q_text_stats",
    "q_text_langid",
    "q_text_fingerprint",
    "q_text_repetition",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_tfidf_terms",
    "q_top_words",
    "q_token_entropy",
    "q_zipf_fit",
    "q_lang_distribution",
    "q_vocab_growth",
    "q_token_budget",
)

#: embedding kernels swept on the all-zero-vector corpus: zero norms
#: hit every cosine denominator
ZERO_VEC_KERNELS = (
    "q_dedup_embedding",
    "q_embedding_outliers",
    "q_embedding_covariance",
    "q_ann_topk",
    "q_semdedup",
    "q_random_projection",
    "q_embedding_quantize",
)


@pytest.mark.parametrize("name", EMPTY_DOC_KERNELS)
def test_stress_empty_documents(spark, doc_stress_dirs, name):
    _sweep(spark, doc_stress_dirs["sf_emptydoc"], name)


@pytest.mark.parametrize("name", ZERO_VEC_KERNELS)
def test_stress_zero_embeddings(spark, doc_stress_dirs, name):
    _sweep(spark, doc_stress_dirs["sf_zerovec"], name)
