"""Round-15 sampling/readout additions: weighted reservoir (A-ES),
quantile normalization, bandit posterior."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.insight import (
    q_quantile_normalize,
)
from dynamodb_streaming_datalake_spark.operators.sampling import (
    WR_K,
    q_weighted_reservoir,
)
from dynamodb_streaming_datalake_spark.operators.experiments import (
    q_bandit_posterior,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from dynamodb_streaming_datalake_spark.sources.readers import read_table
from tests.oracle_utils import compare_query


@pytest.mark.parametrize(
    "name,fn",
    [
        ("q_weighted_reservoir", q_weighted_reservoir),
        ("q_quantile_normalize", q_quantile_normalize),
        ("q_bandit_posterior", q_bandit_posterior),
    ],
)
def test_oracle_parity_smoke(spark, sf_smoke, name, fn):
    compare_query(spark, sf_smoke, name, fn, ORACLE[name])


def test_weighted_reservoir_matches_python_race(spark, sf_smoke):
    """Recompute every doc's exponential race time from the portable
    hash in pure Python; the query's sample must be exactly the WR_K
    earliest finishers."""
    docs = (
        read_table(spark, sf_smoke, "documents")
        .select("doc_id", "n_chars")
        .collect()
    )
    space = float(2**60)
    races = []
    for r in docs:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / (space + 2.0)
        races.append((-math.log(u) / r["n_chars"], r["doc_id"]))
    races.sort()
    want = [d for _, d in races[:WR_K]]
    got = [r["doc_id"] for r in q_weighted_reservoir(spark, sf_smoke).collect()]
    assert got == want
    # heavier docs must be overrepresented: sample mean weight above
    # population mean weight
    wmap = {r["doc_id"]: r["n_chars"] for r in docs}
    pop = sum(wmap.values()) / len(wmap)
    samp = sum(wmap[d] for d in got) / len(got)
    assert samp > pop


def test_quantile_normalize_collapses_group_marginals(spark, sf_smoke):
    """After normalization every group's quartiles sit near the pooled
    quartiles — the defining property of quantile normalization."""
    rows = q_quantile_normalize(spark, sf_smoke).collect()
    assert len(rows) >= 2
    pooled = (
        read_table(spark, sf_smoke, "events")
        .where(F.col("value").isNotNull())
        .agg(F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("g"))
        .collect()[0]["g"]
    )
    for r in rows:
        for got, want in zip((r["p25"], r["p50"], r["p75"]), pooled):
            # groups are ~200 rows at smoke scale; grid interpolation
            # keeps them within a few percent of the pooled quartile
            assert abs(got - want) / abs(want) < 0.05, (r, pooled)


def test_bandit_posterior_is_a_probability_vector(spark, sf_smoke):
    rows = q_bandit_posterior(spark, sf_smoke).collect()
    total = sum(r["p_best"] for r in rows)
    assert abs(total - 1.0) < 5e-3
    for r in rows:
        assert 0.0 <= r["p_best"] <= 1.0
        assert 0.0 < r["post_mean"] < 1.0
    # the arm with the highest posterior mean should lead (arms have
    # comparable n in the fixture, so mean order implies p_best order)
    best_mean = max(rows, key=lambda r: r["post_mean"])
    best_p = max(rows, key=lambda r: r["p_best"])
    assert best_mean["event_type"] == best_p["event_type"]
