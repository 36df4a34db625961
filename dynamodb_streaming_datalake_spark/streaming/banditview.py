"""Continuously maintained bandit state: streaming q_bandit_posterior.

The batch readout (operators.experiments.q_bandit_posterior) computes
per-arm (n, s) counts and the grid-integrated P(best) once. In
production Thompson sampling the state advances with every micro-batch
and the allocator reads the posterior from the committed view — this
module is that loop: a ``foreachBatch`` sink folds each batch's arm
counts into a versioned Parquet view (counts are a monoid: n+n, s+s)
with the same MVCC ``v=<n>`` discipline and crash-replay guard as
streaming.upsert/aggview, and the readout runs the IDENTICAL
``bandit_readout`` kernel over any committed version.

Scale: each refresh is O(|batch arms| + |arms|): the batch pre-reduces
to per-arm counts map-side, the merge joins |arms| rows, and the
posterior arithmetic is constant work on the |arms| x grid frame. The
view is bounded by arm count, never stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dynamodb_streaming_datalake_spark.operators.experiments import (
    bandit_arm_counts,
    bandit_oracle_sql,
    bandit_readout,
)
from dynamodb_streaming_datalake_spark.streaming.upsert import (
    _versions,
    current_snapshot,
)


def upsert_bandit_view(
    spark: SparkSession,
    batch_df: DataFrame,
    view_dir: str,
    version: int,
) -> None:
    """Fold one micro-batch's arm counts into the view as version
    ``version``. Committed-version replays are no-ops (checkpoint
    recovery safety); otherwise counts merge additively with the
    previous committed view."""
    if version in _versions(spark, view_dir):
        return
    delta = bandit_arm_counts(batch_df)
    prev = current_snapshot(spark, view_dir, live_only=False)
    if prev is None:
        merged = delta
    else:
        merged = (
            prev.select(
                F.col("event_type"),
                F.col("n").alias("n_prev"),
                F.col("s").alias("s_prev"),
            )
            .join(
                delta.select(
                    "event_type",
                    F.col("n").alias("n_new"),
                    F.col("s").alias("s_new"),
                ),
                "event_type",
                "full_outer",
            )
            .select(
                "event_type",
                (
                    F.coalesce(F.col("n_prev"), F.lit(0))
                    + F.coalesce(F.col("n_new"), F.lit(0))
                )
                .cast("long")
                .alias("n"),
                (
                    F.coalesce(F.col("s_prev"), F.lit(0))
                    + F.coalesce(F.col("s_new"), F.lit(0))
                )
                .cast("long")
                .alias("s"),
            )
        )
    merged.write.mode("overwrite").parquet(f"{view_dir}/v={version}")


def start_bandit_view_maintenance(
    events: DataFrame,
    view_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch sink over a raw-events stream; every micro-batch
    advances the arm-count view one version."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        upsert_bandit_view(
            batch_df.sparkSession, batch_df, view_dir, version=batch_id
        )

    writer = events.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# driver-gated lifecycle: the streaming twin of q_bandit_posterior
# ---------------------------------------------------------------------------

_BANDITVIEW_VERSION = "v1"


def _ensure_bandit_view(spark: SparkSession, sf_dir: str) -> str:
    """Two committed versions with the REAL fold kernel: v=1 folds the
    even-event_id half, v=2 folds the odd half on top — so v=2 must
    equal the one-shot batch counts. Shared cache discipline."""
    import os

    from dynamodb_streaming_datalake_spark.cache import ensure_cached_build
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    def build(build_dir: str) -> None:
        view = os.path.join(build_dir, "view")
        ev = read_table(spark, sf_dir, "events")
        upsert_bandit_view(
            spark, ev.where(F.col("event_id") % 2 == 0), view, version=1
        )
        upsert_bandit_view(
            spark, ev.where(F.col("event_id") % 2 == 1), view, version=2
        )

    return ensure_cached_build(
        "banditview", _BANDITVIEW_VERSION, sf_dir, build
    )


def _register() -> None:
    from dynamodb_streaming_datalake_spark.registry import query

    _ORACLE = "\nUNION ALL\n".join(
        f"SELECT CAST({v} AS INT) AS version, * FROM ({bandit_oracle_sql(w)})"
        for v, w in ((1, "event_id % 2 = 0"), (2, "TRUE"))
    )

    @query("q_bandit_stream", oracle=_ORACLE)
    def q_bandit_stream(spark, sf_dir):
        """Streaming twin of q_bandit_posterior under the oracle gate:
        the per-arm (n, s) state advances through two committed view
        versions with the real foreachBatch fold kernel (even half ->
        v=1, odd half folded on top -> v=2, cached per sf_dir), and
        BOTH versions are read back through the IDENTICAL
        bandit_readout grid integration — v=1 via time travel after
        v=2 committed. The oracle recomputes each version's posterior
        from the raw events from scratch, so hash equality proves the
        incremental count fold feeds the allocator exactly what a
        one-shot refresh would. The same kernel drains from a genuine
        readStream under availableNow in tests/test_streaming.py.

        Scale: see module docstring — O(|batch arms| + |arms|) per
        refresh; posterior arithmetic constant on |arms| x grid."""
        import os

        path = _ensure_bandit_view(spark, sf_dir)
        view = os.path.join(path, "view")
        out = []
        for v in (1, 2):
            arms = current_snapshot(
                spark, view, live_only=False, version=v
            )
            out.append(
                bandit_readout(spark, arms).select(
                    F.lit(v).cast("int").alias("version"), "*"
                )
            )
        return out[0].unionByName(out[1])


_register()
