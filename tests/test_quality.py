"""Data-quality report: oracle parity, and proof the checks actually
COUNT violations (clean fixtures alone would let a constant-zero
report pass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.quality import (
    fk_contained,
    pk_unique,
    predicate,
    q_data_quality_report,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from tests.oracle_utils import compare_query


def test_q_data_quality_report_oracle_parity(spark, sf_smoke):
    compare_query(
        spark, sf_smoke, "q_data_quality_report", q_data_quality_report,
        ORACLE["q_data_quality_report"],
    )


def test_checks_count_injected_violations(spark):
    """Each check builder must report exact violation counts on dirty
    synthetic inputs — 3 duplicate keys, 2 orphans, 4 bad values."""
    dirty = spark.createDataFrame(
        [(1,), (1,), (2,), (2,), (3,), (3,), (4,)], "k long"
    )
    r = pk_unique(dirty, "t", "k").collect()[0]
    assert (r["n_checked"], r["n_violations"]) == (7, 3)

    child = spark.createDataFrame([(1,), (2,), (8,), (9,)], "ck long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_contained(child, "ck", parent, "pk", "fk", "t").collect()[0]
    assert (r["n_checked"], r["n_violations"]) == (4, 2)

    vals = spark.createDataFrame(
        [(-1.0,), (-2.0,), (0.0,), (5.0,), (-0.5,), (-9.0,)], "v double"
    )
    r = predicate(vals, F.col("v") < 0, "nonneg", "t").collect()[0]
    assert (r["n_checked"], r["n_violations"]) == (6, 4)


def test_report_is_all_green_on_driver_fixtures(spark, sf_smoke):
    """The shipped fixtures satisfy every constraint (and the report
    carries real checked-row counts, not zeros)."""
    rows = q_data_quality_report(spark, sf_smoke).collect()
    assert len(rows) == 7
    assert all(r["n_violations"] == 0 for r in rows)
    assert all(r["n_checked"] > 0 for r in rows)


def test_q_order_baskets_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_order_baskets,
    )

    compare_query(
        spark, sf_smoke, "q_order_baskets", q_order_baskets,
        ORACLE["q_order_baskets"],
    )


def test_basket_stats_match_flat_computation(spark, sf_smoke):
    """Nested-vs-flat equivalence, asserted directly in Spark (the
    oracle asserts it cross-engine): the HOF fold over the nested
    basket equals the plain flat aggregate."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_order_baskets,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    li = read_table(spark, sf_smoke, "lineitem")
    flat = {
        r["l_orderkey"]: (r["n"], float(r["s"]))
        for r in li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    nested = {
        r["l_orderkey"]: (r["n_items"], r["basket_value"])
        for r in q_order_baskets(spark, sf_smoke).collect()
    }
    assert nested == flat


def test_q_para_dedup_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.dedup import q_para_dedup

    compare_query(
        spark, sf_smoke, "q_para_dedup", q_para_dedup, ORACLE["q_para_dedup"]
    )


def test_para_dedup_first_occurrence_semantics(spark, sf_smoke):
    """Real duplicates exist in the corpus (the operator isn't a
    no-op); every doc's removed count is bounded by its block count;
    and the earliest document containing any duplicated block keeps
    it (first-occurrence-wins)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.dedup import q_para_dedup

    out = q_para_dedup(spark, sf_smoke)
    stats = out.agg(
        F.sum("n_removed").alias("rem"), F.sum("n_blocks").alias("tot")
    ).first()
    assert stats["rem"] > 0, "fixture should contain repeated blocks"
    assert stats["rem"] < stats["tot"]
    assert out.where(F.col("n_removed") > F.col("n_blocks")).count() == 0
    # doc 0 keeps the first occurrence of everything it contains, so
    # its removals are exactly its INTERNAL repeats (a later position
    # repeating an earlier block within doc 0 itself)
    from dynamodb_streaming_datalake_spark.operators.dedup import PARA_BLOCK
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    text0 = (
        read_table(spark, sf_smoke, "documents")
        .where(F.col("doc_id") == 0)
        .first()["text"]
    )
    toks = text0.split(" ")
    blocks0 = [
        " ".join(toks[i : i + PARA_BLOCK])
        for i in range(0, len(toks), PARA_BLOCK)
    ]
    internal_dups = len(blocks0) - len(set(blocks0))
    first_doc = out.where(F.col("doc_id") == 0).first()
    assert first_doc["n_removed"] == internal_dups


def test_q_schema_evolution_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.sources.evolution import (
        q_schema_evolution,
    )

    compare_query(
        spark, sf_smoke, "q_schema_evolution", q_schema_evolution,
        ORACLE["q_schema_evolution"],
    )


def test_schema_evolution_reads_both_generations(spark, sf_smoke):
    """gen-1 files genuinely lack the new column on disk; the merged
    read covers every base row exactly once and back-fills NULL (not a
    default baked at write time)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.sources.evolution import (
        ensure_generations,
        q_schema_evolution,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    path = ensure_generations(spark, sf_smoke)
    gen1 = spark.read.parquet(f"{path}/gen=1")
    assert "o_channel" not in gen1.columns
    out = q_schema_evolution(spark, sf_smoke)
    total = out.agg(F.sum("n_orders")).first()[0]
    assert total == read_table(spark, sf_smoke, "orders").count()
    legacy = {r["channel"]: r["n_orders"] for r in out.collect()}
    assert legacy["legacy"] == gen1.count()


def test_q_linreg_train_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_linreg_train,
    )

    compare_query(
        spark, sf_smoke, "q_linreg_train", q_linreg_train,
        ORACLE["q_linreg_train"],
    )


def test_linreg_recovers_planted_line(spark):
    """Fit on synthetic y = 3x - 5 (exact): slope 3, intercept -5,
    r2 = 1 — the closed form solves, not just aggregates."""
    import datetime

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_linreg_train,
    )

    rows = [
        (i, datetime.datetime(2024, 1, 1, hour), "t", float(3 * hour - 5))
        for i, hour in enumerate([1, 3, 5, 7, 11, 13, 17, 23])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        # write a miniature events table and reuse the real query fn
        df.write.parquet(f"{tmp}/events.parquet")
        out = q_linreg_train(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["slope"], r["intercept"], r["r2"]) == (3.0, -5.0, 1.0)


def test_q_csv_roundtrip_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.sources.formats import q_csv_roundtrip

    compare_query(
        spark, sf_smoke, "q_csv_roundtrip", q_csv_roundtrip,
        ORACLE["q_csv_roundtrip"],
    )


def test_csv_hazard_fields_survive(spark, sf_smoke):
    """The written CSV really contains embedded delimiters, doubled
    quotes, and raw newlines, and the reader recovers every row."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.sources.formats import (
        _csv_source,
        ensure_csv,
    )

    path = ensure_csv(spark, sf_smoke)
    df = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema(
            "c_custkey bigint, c_name string, c_acctbal decimal(12,2),"
            " c_note string"
        )
        .csv(f"{path}/csv")
    )
    src = _csv_source(spark, sf_smoke)
    assert df.count() == src.count()
    sample = df.orderBy("c_custkey").first()["c_note"]
    assert '"' in sample and "," in sample and "\n" in sample
    # byte-identical notes after the roundtrip
    a = {r["c_custkey"]: r["c_note"] for r in df.collect()}
    b = {r["c_custkey"]: r["c_note"] for r in src.collect()}
    assert a == b


def test_q_orc_roundtrip_oracle_parity_and_pushdown(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.sources.formats import q_orc_roundtrip

    compare_query(
        spark, sf_smoke, "q_orc_roundtrip", q_orc_roundtrip,
        ORACLE["q_orc_roundtrip"],
    )
    plan = (
        q_orc_roundtrip(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:200]


def test_q_avro_scan_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.sources.formats import q_avro_scan

    compare_query(
        spark, sf_smoke, "q_avro_scan", q_avro_scan, ORACLE["q_avro_scan"]
    )


def test_avro_ocf_writer_reader_spec_surface():
    """OCF grammar edge cases: negative longs zigzag correctly, the
    deflate codec is RAW deflate, sync-marker corruption and truncated
    blocks fail loudly, and the reader is schema-driven (field order
    comes from the embedded schema, not assumptions)."""
    import os
    import tempfile

    import pytest

    from dynamodb_streaming_datalake_spark.sources.formats import (
        _AVRO_SCHEMA,
        parse_avro_ocf,
        write_avro_ocf,
    )

    recs = [(-(2**40), "naïve ünïcode", 0), (2**40, "", -1)]
    with tempfile.TemporaryDirectory() as t:
        p = os.path.join(t, "x.avro")
        write_avro_ocf(p, _AVRO_SCHEMA, recs)
        blob = open(p, "rb").read()
    schema, out = parse_avro_ocf(blob)
    assert out == recs
    assert [f["name"] for f in schema["fields"]] == [
        "doc_id", "lang", "n_chars"
    ]
    with pytest.raises(ValueError, match="not an Avro"):
        parse_avro_ocf(b"PAR1" + blob)
    # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        parse_avro_ocf(blob[:-1] + bytes([blob[-1] ^ 0xFF]))
    # reordered schema fields drive decoding -> different tuple order
    sch2 = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "lang", "type": "string"},
            {"name": "doc_id", "type": "long"},
            {"name": "n_chars", "type": "long"},
        ],
    }
    with tempfile.TemporaryDirectory() as t:
        p = os.path.join(t, "y.avro")
        write_avro_ocf(p, sch2, [("fr", 7, 99)])
        _, out2 = parse_avro_ocf(open(p, "rb").read())
    assert out2 == [("fr", 7, 99)]


def test_q_cohort_retention_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_cohort_retention,
    )

    compare_query(
        spark, sf_smoke, "q_cohort_retention", q_cohort_retention,
        ORACLE["q_cohort_retention"],
    )


def test_cohort_retention_offsets_are_nonnegative_and_week0_full(spark, sf_smoke):
    """week_offset >= 0 always, and every cohort's week-0 count equals
    its cohort size (everyone is active the week they first appear)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_cohort_retention,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    out = q_cohort_retention(spark, sf_smoke)
    assert out.where(F.col("week_offset") < 0).count() == 0
    ev = read_table(spark, sf_smoke, "events")
    week = (F.floor(F.unix_timestamp("ts") / F.lit(604800))).cast("bigint")
    sizes = (
        ev.groupBy("user_id").agg(F.min(week).alias("cohort_w"))
        .groupBy("cohort_w").agg(F.count(F.lit(1)).alias("n"))
    )
    week0 = {
        r["cohort_w"]: r["active_users"]
        for r in out.where(F.col("week_offset") == 0).collect()
    }
    for r in sizes.collect():
        assert week0[r["cohort_w"]] == r["n"]


def test_q_sequence_pattern_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_sequence_pattern,
    )

    compare_query(
        spark, sf_smoke, "q_sequence_pattern", q_sequence_pattern,
        ORACLE["q_sequence_pattern"],
    )


def test_q_equidepth_histogram_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_equidepth_histogram,
    )

    compare_query(
        spark, sf_smoke, "q_equidepth_histogram", q_equidepth_histogram,
        ORACLE["q_equidepth_histogram"],
    )


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_smoke):
    from pyspark.sql import functions as F  # noqa: F401

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        EQD_BUCKETS,
        q_equidepth_histogram,
    )

    rows = sorted(
        q_equidepth_histogram(spark, sf_smoke).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, EQD_BUCKETS + 1))
    counts = [r["n"] for r in rows]
    assert max(counts) - min(counts) <= 1  # NTILE's equi-depth promise
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]  # bucket ranges are ordered


def test_q_warc_ingest_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.sources.formats import q_warc_ingest

    compare_query(
        spark, sf_smoke, "q_warc_ingest", q_warc_ingest,
        ORACLE["q_warc_ingest"],
    )


def test_warc_framing_comes_from_content_length():
    """Payloads contain header-looking byte sequences; the walker must
    frame on Content-Length. Also: warcinfo skipped, truncation and
    missing separators loud."""
    import pytest

    from dynamodb_streaming_datalake_spark.sources.formats import (
        _warc_info,
        _warc_record,
        parse_warc,
    )

    blob = _warc_info(0) + _warc_record(7, "en", "hello world") + _warc_record(
        8, "fr", "bonjour"
    )
    recs = parse_warc(blob)
    assert recs == [
        (7, "https://example.invalid/en/7", "hello world"),
        (8, "https://example.invalid/fr/8", "bonjour"),
    ]
    # a body whose TEXT itself ends in trailer-shaped bytes must survive
    # verbatim: slicing is by X-Text-Length, never by pattern (round-6
    # advice — the old rsplit sentinel truncated such bodies)
    hazard = "text that ends like\r\nWARC-Trailer: inside-payload\r\n\r\n"
    assert parse_warc(_warc_record(9, "de", hazard)) == [
        (9, "https://example.invalid/de/9", hazard)
    ]
    with pytest.raises(ValueError, match="bad WARC version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(blob[:-20])


def test_q_zip_ingest_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.sources.formats import q_zip_ingest

    compare_query(
        spark, sf_smoke, "q_zip_ingest", q_zip_ingest, ORACLE["q_zip_ingest"]
    )


def test_zip_reader_handles_both_methods_and_guards():
    """Spec-surface checks against stdlib-written archives: STORED and
    DEFLATE members, EOCD behind a comment, and loud failures on
    corruption / unsupported methods."""
    import io
    import zipfile

    import pytest

    from dynamodb_streaming_datalake_spark.sources.formats import parse_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("a/1.txt"), "stored member",
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr(
            zipfile.ZipInfo("b/2.txt"), "deflated member " * 50,
            compress_type=zipfile.ZIP_DEFLATED,
        )
        # comment CONTAINS the EOCD signature: a bare rfind would lock
        # onto it and unpack garbage offsets (round-6 advice) — the scan
        # must validate comment-length-reaches-EOF and keep looking back
        zf.comment = b"comment with embedded PK\x05\x06 signature bytes"
    blob = buf.getvalue()
    got = dict(parse_zip(blob))
    assert got["a/1.txt"] == "stored member"
    assert got["b/2.txt"] == "deflated member " * 50
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(b"not an archive at all")
    # corrupt a central-directory signature
    bad = bytearray(blob)
    cd_at = blob.rfind(b"PK\x01\x02")
    bad[cd_at] = 0x00
    with pytest.raises(ValueError, match="central-directory|end-of-central"):
        parse_zip(bytes(bad))


def test_q_tgz_ingest_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.sources.formats import q_tgz_ingest

    compare_query(
        spark, sf_smoke, "q_tgz_ingest", q_tgz_ingest, ORACLE["q_tgz_ingest"]
    )


def test_tgz_reader_verifies_checksums_and_padding():
    import io
    import tarfile

    import pytest

    from dynamodb_streaming_datalake_spark.sources.formats import parse_tgz

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for n, t in (("a/x.txt", "x" * 700), ("b/y.txt", "short")):
            d = t.encode()
            info = tarfile.TarInfo(n)
            info.size = len(d)
            tf.addfile(info, io.BytesIO(d))
    blob = buf.getvalue()
    got = dict(parse_tgz(blob))
    assert got == {"a/x.txt": "x" * 700, "b/y.txt": "short"}
    # corrupt one header byte inside the tar stream -> checksum fails
    import zlib

    tar = bytearray(zlib.decompress(blob, 31))
    tar[1] ^= 0xFF  # second byte of the first member's name field
    comp = zlib.compressobj(9, zlib.DEFLATED, 31)
    bad = comp.compress(bytes(tar)) + comp.flush()
    with pytest.raises(ValueError, match="checksum"):
        parse_tgz(bad)


def test_freshness_monitor_consistency(spark, sf_smoke):
    """Gap days = span - observed >= 0, the latest day matches the raw
    max, and anomalous days never exceed observed days."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    rows = all_queries()["q_freshness_monitor"](spark, sf_smoke).collect()
    assert rows
    raw_latest = (
        read_table(spark, sf_smoke, "events")
        .agg(F.date_format(F.max(F.col("ts").cast("date")), "yyyy-MM-dd"))
        .first()[0]
    )
    assert max(r["latest_day"] for r in rows) == raw_latest
    for r in rows:
        assert r["n_gap_days"] == r["span_days"] - r["n_days"] >= 0
        assert 0 <= r["n_anomalous_days"] <= r["n_days"]
        assert r["sd_daily_rows"] >= 0


def test_histogram_drift_invariants(spark, sf_smoke):
    """Shares each sum to 1, TVD is a [0,1] distance equal to half the
    L1 between the share vectors, chi-square is non-negative, and the
    distances are identical on every row (in-row summary contract)."""
    from dynamodb_streaming_datalake_spark.operators.quality import (
        DRIFT_BINS,
        q_histogram_drift,
    )

    rows = q_histogram_drift(spark, sf_smoke).collect()
    assert 0 < len(rows) <= DRIFT_BINS
    assert abs(sum(r["ref_share"] for r in rows) - 1) < 1e-3
    assert abs(sum(r["cur_share"] for r in rows) - 1) < 1e-3
    tvd = rows[0]["tvd"]
    assert all(r["tvd"] == tvd and r["chi2"] == rows[0]["chi2"] for r in rows)
    l1 = sum(abs(r["ref_share"] - r["cur_share"]) for r in rows)
    assert abs(tvd - l1 / 2) < 1e-3
    assert 0 <= tvd <= 1 and rows[0]["chi2"] >= 0


def test_benford_audit_shares_and_chi2(spark, sf_smoke):
    """Nine rows, observed shares sum to 1, chi2 = sum of the in-row
    terms, and expected shares are the Benford constants."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    rows = sorted(
        all_queries()["q_benford_audit"](spark, sf_smoke).collect(),
        key=lambda r: r["digit"],
    )
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-4
    assert abs(rows[0]["benford_share"] - 0.30103) < 1e-9
    assert abs(
        rows[0]["chi2"] - sum(r["chi_term"] for r in rows)
    ) < 1e-6


def test_cumulative_users_telescopes(spark, sf_smoke):
    """The final cumulative total equals the table's true distinct-user
    count, new <= active every day, and the running total is the prefix
    sum of new_users."""
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    rows = sorted(
        all_queries()["q_cumulative_users"](spark, sf_smoke).collect(),
        key=lambda r: r["day_i"],
    )
    total = (
        read_table(spark, sf_smoke, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[-1]["cumulative_users"] == total
    run = 0
    for r in rows:
        assert r["new_users"] <= r["active_users"]
        assert r["returning_users"] == r["active_users"] - r["new_users"]
        run += r["new_users"]
        assert r["cumulative_users"] == run


def test_mad_outliers_matches_python_order_statistics(spark, sf_smoke):
    """Lower-median / MAD / fence counts recomputed in Python on the
    same decimal-quantized values must match exactly."""
    from decimal import ROUND_HALF_UP, Decimal

    from dynamodb_streaming_datalake_spark.operators.quality import MAD_K
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    q6 = Decimal(1).scaleb(-6)
    vals = {}
    for r in read_table(spark, sf_smoke, "events").select(
        "event_type", "value"
    ).collect():
        vals.setdefault(r["event_type"], []).append(
            Decimal(repr(r["value"])).quantize(q6, ROUND_HALF_UP)
        )

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    got = {
        r["event_type"]: r
        for r in all_queries()["q_mad_outliers"](spark, sf_smoke).collect()
    }
    assert set(got) == set(vals)
    for t, xs in vals.items():
        med = lower_median(xs)
        devs = [abs(x - med) for x in xs]
        mad = lower_median(devs)
        n_out = sum(1 for d in devs if d > MAD_K * mad)
        r = got[t]
        assert r["n"] == len(xs)
        assert r["median_value"] == float(med)
        assert r["mad"] == float(mad)
        assert r["n_outliers"] == n_out
        assert r["max_abs_dev"] == float(max(devs))


def test_fd_audit_identity_and_planted_dependency(spark, sf_smoke):
    """The FD audit's melt plan equals per-pair brute force, and a
    PLANTED exact dependency (dep = f(det)) is reported as holding
    while a broken one is not."""
    from pyspark.sql import functions as F

    rows = [(i, i % 5, (i % 5) * 10, i % 3) for i in range(100)]
    # derived = exact function of k5; noisy = not a function of k5
    df = spark.createDataFrame(
        rows, "id int, k5 int, derived int, noisy int"
    )
    base = df.select(
        F.col("k5").cast("string").alias("k5"),
        F.col("derived").cast("string").alias("derived"),
        F.col("noisy").cast("string").alias("noisy"),
    )
    pairs = [("k5", "derived"), ("k5", "noisy")]
    stack = "stack(2, {}) as (det_name, det_val, dep_name, dep_val)".format(
        ", ".join(f"'{a}', {a}, '{b}', {b}" for a, b in pairs)
    )
    lvl1 = (
        base.select(F.expr(stack))
        .groupBy("det_name", "dep_name", "det_val")
        .agg(F.countDistinct("dep_val").alias("ndep"))
    )
    out = {
        (r["det_name"], r["dep_name"]): r
        for r in lvl1.groupBy("det_name", "dep_name")
        .agg(
            F.count(F.lit(1)).alias("n_det_values"),
            F.sum(F.col("ndep") - 1).alias("n_violations"),
            (F.sum(F.col("ndep") - 1) == 0).alias("fd_holds"),
        )
        .collect()
    }
    assert out[("k5", "derived")]["fd_holds"] is True
    assert out[("k5", "derived")]["n_violations"] == 0
    assert out[("k5", "noisy")]["fd_holds"] is False
    # identity: violations = distinct(det, dep) - distinct(det)
    want = (
        df.select("k5", "noisy").distinct().count()
        - df.select("k5").distinct().count()
    )
    assert out[("k5", "noisy")]["n_violations"] == want


def test_ri_audit_detects_planted_orphans(spark, tmp_path, sf_smoke):
    """The orphan detector fires: copy the smoke tables, delete some
    parents, and the audit must count exactly the orphaned children."""
    import shutil

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    src = sf_smoke
    dst = str(tmp_path / "broken")
    import os

    os.makedirs(dst)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    # break it: drop every customer with c_custkey % 7 == 0
    cust = read_table(spark, src, "customer").where(
        "c_custkey % 7 != 0"
    )
    cust.toPandas().to_parquet(f"{dst}/customer.parquet", index=False)
    got = {
        r["edge"]: r
        for r in all_queries()["q_ri_audit"](spark, dst).collect()
    }
    want = (
        read_table(spark, src, "orders")
        .where("o_custkey % 7 = 0")
        .count()
    )
    e = got["orders.o_custkey->customer"]
    assert e["n_orphans"] == want > 0, (dict(e), want)
    # untouched edges stay clean
    assert got["lineitem.l_orderkey->orders"]["n_orphans"] == 0


def test_t_closeness_agrees_with_python_emd(spark, sf_oracle):
    """Recompute one released group's ordered EMD in Python from raw
    counts and compare; also check the violation flag is consistent.
    Runs at sf0.01 — the k=10 release floor empties at smoke scale."""
    sf_smoke = sf_oracle
    from dynamodb_streaming_datalake_spark.operators.privacy import (
        ACCTBAL_BAND,
        T_CLOSE,
        q_t_closeness,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    rows = q_t_closeness(spark, sf_smoke).collect()
    assert rows
    c = read_table(spark, sf_smoke, "customer").select(
        "c_mktsegment",
        (
            F.floor(F.col("c_acctbal") / ACCTBAL_BAND).cast("bigint")
            * ACCTBAL_BAND
        ).alias("band"),
        "c_nationkey",
    ).collect()
    from collections import Counter

    glob = Counter(r["c_nationkey"] for r in c)
    vals = sorted(glob)
    ng = sum(glob.values())
    m = len(vals)
    target = rows[0]
    cls = Counter(
        r["c_nationkey"]
        for r in c
        if r["c_mktsegment"] == target["c_mktsegment"]
        and r["band"] == target["acctbal_band"]
    )
    nc = sum(cls.values())
    cum_c = cum_g = 0
    emd_num = 0
    for v in vals:
        cum_c += cls.get(v, 0)
        cum_g += glob[v]
        emd_num += abs(ng * cum_c - nc * cum_g)
    emd = emd_num / (nc * ng * (m - 1))
    assert abs(target["emd"] - emd) < 1e-6
    assert target["group_size"] == nc
    for r in rows:
        assert r["t_violation"] == int(r["emd"] > T_CLOSE) or (
            abs(r["emd"] - T_CLOSE) < 1e-6
        )


def test_blocking_eval_orders_schemes_sensibly(spark, sf_smoke):
    """Finer blocking keys must not increase candidate counts, and the
    ER scheme keeps every true pair (corruption is past the prefix)."""
    from dynamodb_streaming_datalake_spark.operators.curation import (
        q_blocking_eval,
    )

    rows = {r["scheme"]: r for r in q_blocking_eval(spark, sf_smoke).collect()}
    assert set(rows) == {"brand", "brand_prefix2", "prefix3"}
    # brand_prefix2 refines brand: strictly fewer (or equal) candidates
    assert (
        rows["brand_prefix2"]["n_candidates"] <= rows["brand"]["n_candidates"]
    )
    # the fixture corrupts only past position 2, so the 2-char-prefix
    # schemes keep every true pair
    assert (
        rows["brand_prefix2"]["pairs_completeness"] == 1.0
    ), rows["brand_prefix2"]
    assert rows["brand"]["pairs_completeness"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["reduction_ratio"] <= 1.0


def test_two_sample_ks_matches_python_exact_d(spark, sf_smoke):
    """Recompute the exact KS D (and the asymptotic p series) in pure
    Python over the collected values; the distributed two-level ECDF
    must agree."""
    import math

    from dynamodb_streaming_datalake_spark.operators.quality import (
        KS_SPLIT,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    rows = all_queries()["q_two_sample_ks"](spark, sf_smoke).collect()
    assert len(rows) == 1
    got = rows[0]
    ev = (
        read_table(spark, sf_smoke, "events")
        .where(F.col("value").isNotNull())
        .select(
            "value",
            (F.col("ts") < F.lit(KS_SPLIT).cast("timestamp")).alias("a"),
        )
        .collect()
    )
    xs = sorted(r["value"] for r in ev if r["a"])
    ys = sorted(r["value"] for r in ev if not r["a"])
    n1, n2 = len(xs), len(ys)
    assert (got["n1"], got["n2"]) == (n1, n2)
    vals = sorted(set(xs) | set(ys))
    import bisect

    d = 0.0
    for v in vals:
        fa = bisect.bisect_right(xs, v) / n1
        fb = bisect.bisect_right(ys, v) / n2
        d = max(d, abs(fa - fb))
    assert abs(got["d_stat"] - d) < 1e-6
    ne = math.sqrt(n1 * n2 / (n1 + n2))
    lam = (ne + 0.12 + 0.11 / ne) * d
    p = 2.0 * sum(
        (-1) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        for j in range(1, 101)
    )
    p = min(max(p, 0.0), 1.0)
    assert abs(got["p_value"] - p) < 1e-5


def test_mann_whitney_matches_python_ranksum(spark, sf_smoke):
    """Recompute U, the tie-corrected z, and the erfc p in pure Python
    from the collected values."""
    import math

    from dynamodb_streaming_datalake_spark.operators.quality import (
        KS_SPLIT,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    got = all_queries()["q_mann_whitney"](spark, sf_smoke).collect()[0]
    ev = (
        read_table(spark, sf_smoke, "events")
        .where(F.col("value").isNotNull())
        .select(
            "value",
            (F.col("ts") < F.lit(KS_SPLIT).cast("timestamp")).alias("a"),
        )
        .collect()
    )
    from collections import Counter

    ca = Counter(r["value"] for r in ev if r["a"])
    call = Counter(r["value"] for r in ev)
    n1 = sum(ca.values())
    n2 = sum(call.values()) - n1
    cum = 0
    r2a = 0
    ties = 0
    for v in sorted(call):
        c = call[v]
        r2a += ca.get(v, 0) * (2 * cum + c + 1)
        ties += c**3 - c
        cum += c
    u = r2a / 2 - n1 * (n1 + 1) / 2
    mu = n1 * n2 / 2
    nn = n1 + n2
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((nn + 1) - ties / (nn * (nn - 1)))
    )
    z = max(abs(u - mu) - 0.5, 0.0) / sigma
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["u_stat"] - u) < 0.51
    assert abs(got["z_score"] - z) < 1e-5
    # p from math.erfc should agree with the generated polynomial to
    # its documented 1.5e-7 absolute error
    p = math.erfc(z / math.sqrt(2))
    assert abs(got["p_value"] - min(p, 1.0)) < 1e-5


def test_cramers_v_matches_python_chi2(spark, sf_smoke):
    """Recompute one pair's chi-square and V from the contingency
    table in Python."""
    import math

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F
    from collections import Counter

    got = {
        r["pair"]: r
        for r in all_queries()["q_cramers_v"](spark, sf_smoke).collect()
    }
    rows = (
        read_table(spark, sf_smoke, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    )
    cells = Counter((r["o_orderstatus"], r["o_orderpriority"]) for r in rows)
    ra = Counter()
    cb = Counter()
    for (a, b), n in cells.items():
        ra[a] += n
        cb[b] += n
    nn = sum(cells.values())
    chi2 = sum(
        (n - ra[a] * cb[b] / nn) ** 2 / (ra[a] * cb[b] / nn)
        for (a, b), n in cells.items()
    )
    v = math.sqrt(chi2 / (nn * min(len(ra) - 1, len(cb) - 1)))
    t = got["status|priority"]
    assert t["n_rows"] == nn
    assert (t["r"], t["c"]) == (len(ra), len(cb))
    assert abs(t["chi2"] - chi2) < 1e-4
    assert abs(t["cramers_v"] - v) < 1e-6
    for r in got.values():
        assert 0.0 <= r["cramers_v"] <= 1.0


def test_drift_battery_bh_is_step_up_consistent(spark, sf_smoke):
    """BH invariants: ranks are a permutation, the rejection set is a
    prefix of the p-ordered battery, and every rejected p sits at or
    below the cutoff defined by the LARGEST satisfying rank."""
    from dynamodb_streaming_datalake_spark.operators.quality import BH_Q
    from dynamodb_streaming_datalake_spark.registry import all_queries

    rows = sorted(
        all_queries()["q_drift_battery"](spark, sf_smoke).collect(),
        key=lambda r: r["bh_rank"],
    )
    m = len(rows)
    assert [r["bh_rank"] for r in rows] == list(range(1, m + 1))
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    k_star = max(
        (r["bh_rank"] for r in rows if r["p_value"] <= r["bh_rank"] * BH_Q / m),
        default=0,
    )
    for r in rows:
        assert r["rejected"] == (r["bh_rank"] <= k_star)
        assert abs(r["bh_threshold"] - r["bh_rank"] * BH_Q / m) < 1e-6


def test_mutual_information_matches_python(spark, sf_smoke):
    import math
    from collections import Counter

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    got = {
        r["pair"]: r
        for r in all_queries()["q_mutual_information"](
            spark, sf_smoke
        ).collect()
    }
    rows = (
        read_table(spark, sf_smoke, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    )
    cells = Counter((r["o_orderstatus"], r["o_orderpriority"]) for r in rows)
    ra = Counter()
    cb = Counter()
    for (a, b), n in cells.items():
        ra[a] += n
        cb[b] += n
    nn = sum(cells.values())
    mi = sum(
        (n / nn) * math.log(n * nn / (ra[a] * cb[b]))
        for (a, b), n in cells.items()
    )
    h_a = -sum((v / nn) * math.log(v / nn) for v in ra.values())
    h_b = -sum((v / nn) * math.log(v / nn) for v in cb.values())
    t = got["status|priority"]
    assert abs(t["mi_nats"] - mi) < 1e-5
    assert abs(t["entropy_a"] - h_a) < 1e-5
    assert abs(t["entropy_b"] - h_b) < 1e-5
    assert abs(t["normalized_mi"] - mi / min(h_a, h_b)) < 1e-4
    for r in got.values():
        assert -1e-6 <= r["normalized_mi"] <= 1.0
        assert r["mi_nats"] >= -1e-6
