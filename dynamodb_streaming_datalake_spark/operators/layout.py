"""Multi-dimensional file layout (z-order) for data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group/file min-max statistics prune reads only if rows with
similar values are physically co-located. Sorting by one column skips
perfectly on that column and not at all on others; interleaving the
bits of several columns' ranks (a Morton / z-order curve) gives every
interleaved column locality, so selective predicates on ANY of them
prune files. This is the layout strategy behind Delta Lake's
``OPTIMIZE ZORDER BY`` and ClickHouse/Databricks liquid clustering —
re-expressed here as plain declarative Spark: normalize, quantize,
bit-interleave (all JVM-side column expressions), then
``repartitionByRange`` + ``sortWithinPartitions`` on the z-value.

The reference has no layout management at all beyond Firehose's
time-prefix (`/root/reference/lib/dynamodb-streaming-datalake-stack.ts
:222`) — time is the ONE dimension its lake can skip on; z-order adds
the rest.

Scale notes:
* per-column quantile cutoffs come from a single 1-row aggregate
  (t-digest ``percentile_approx``) broadcast back onto the frame — no
  driver collect, no second pass per column;
* quantization to 8 bits/column bounds the interleave at 2 cols x 8
  bits = 16-bit z-values — enough to order thousands of files;
* ``repartitionByRange`` samples the z-value distribution (Spark's
  range partitioner), so output files are size-balanced even when the
  value distribution is skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8


def _quantize(c: Column, cutoffs: Column) -> Column:
    """Quantile-rank a numeric column into [0, 2^BITS): bucket = how
    many of the 2^BITS-1 approx-quantile cutoffs lie at/below the
    value. Equal-population buckets (not min-max scaling) are what make
    the z-curve's sqrt-locality guarantee hold under skew — min-max
    buckets collapse when the distribution bunches, putting most rows
    in a few codes and spreading any selective predicate over most
    files."""
    x = c.cast("double")
    b = F.size(F.filter(cutoffs, lambda q: q <= x))
    return F.least(F.greatest(b, F.lit(0)), F.lit(2**BITS - 1)).cast("long")


def _interleave(a: Column, b: Column) -> Column:
    """Morton-interleave two BITS-bit integers (a gets even bits)."""
    z = F.lit(0).cast("long")
    for k in range(BITS):
        abit = F.shiftleft(F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k)
        bbit = F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        z = z.bitwiseOR(abit).bitwiseOR(bbit)
    return z


def zorder_write(
    df: DataFrame, cols: tuple[str, str], path: str, n_files: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files z-ordered on two
    numeric columns, so min-max pruning works for predicates on either
    column (or both)."""
    c0, c1 = cols
    probs = [i / (2**BITS) for i in range(1, 2**BITS)]
    stats = df.agg(
        F.percentile_approx(F.col(c0).cast("double"), probs).alias("q0"),
        F.percentile_approx(F.col(c1).cast("double"), probs).alias("q1"),
    )
    z = _interleave(
        _quantize(F.col(c0), F.col("q0")),
        _quantize(F.col(c1), F.col("q1")),
    )
    (
        df.join(F.broadcast(stats))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "q0", "q1")
        .write.mode("overwrite")
        .parquet(path)
    )
