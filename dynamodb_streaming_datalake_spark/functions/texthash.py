"""Text shingling & portable hashing primitives.

Design constraint: every primitive here must be computable *identically*
in DuckDB SQL so the driver's oracle hash-matches. That rules out
Spark's xxhash64/murmur (engine-specific); md5 is the portable 128-bit
hash both engines implement identically, and its hex prefix converted
to a 60-bit integer is our portable integer hash.

Order-independence at scale: anything aggregated across rows
(minhash MIN, simhash bit votes, LSH projections) uses operations whose
result does not depend on partition/arrival order — string MIN, integer
SUM, exact-decimal SUM — never float addition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 15 hex chars = 60 bits — fits a signed 64-bit int in both engines
HASH_BITS = 60


def words(col: str = "text") -> Column:
    """Whitespace tokens (the fixture corpus is single-space joined)."""
    return F.split(F.col(col), " ")


def word_shingles(col: str = "text", n: int = 3) -> Column:
    """Distinct n-word shingles; empty array for docs shorter than n.

    The guard mirrors DuckDB's ``generate_series(1, len-n+1)`` (empty
    when len < n) — Spark's ``sequence(1, 0)`` would count *down*, so it
    must be gated explicitly.

    Portable contract is SET equality, not array order: Spark
    ``array_distinct`` keeps first occurrence while DuckDB
    ``list_distinct`` does not guarantee order — so every cross-engine
    consumer must be order-insensitive (MIN, counts, intersect/union
    sizes; verified for arbitrary inputs in
    ``tests/test_property_crossengine.py``).
    """
    # `w -> …` binds the split array ONCE per row; inlining split()
    # into the inner lambda would re-tokenize the whole string per
    # shingle index (O(words²) splits per doc — measured 2.3 s vs
    # 0.4 s over 5k docs at sf0.1)
    return F.expr(
        f"""
        element_at(transform(array(split({col}, ' ')), w ->
            CASE WHEN size(w) >= {n}
            THEN array_distinct(transform(
                sequence(1, size(w) - {n - 1}),
                i -> concat_ws(' ', slice(w, i, {n}))))
            ELSE array() END), 1)
        """
    )


def sql_word_shingles(col: str = "text", n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles` (1-based inclusive slices)."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len(string_split({col}, ' ')) - {n - 1}, 0)), "
        f"i -> array_to_string(string_split({col}, ' ')[i:i+{n - 1}], ' ')))"
    )


def portable_hash60(c: Column) -> Column:
    """md5 hex prefix -> 60-bit non-negative bigint, identical in DuckDB
    via ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def sql_portable_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a *fixed evaluation shape*:
    dot/(sqrt(na)*sqrt(nb)), each sum a sequential left-to-right fold in
    double — the DuckDB oracle spells out the identical formula, so the
    result is bit-identical, not merely close."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    nb = F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def sq_sum(c: Column) -> Column:
    """One side's norm sum — the EXACT fold :func:`cosine` builds for
    that side (cast -> x*x transform -> sequential left fold). Hoist it
    to one evaluation per ROW before a join/cross that would otherwise
    re-run it once per pair (round 17/18 eval-panel pattern; guide
    §1.2 — don't recompute what a join amplifies)."""
    cd = c.cast("array<double>")
    return F.aggregate(
        F.transform(cd, lambda x: x * x), F.lit(0.0), lambda s, v: s + v
    )


def cosine_hoisted(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with both norm sums supplied from hoisted
    :func:`sq_sum` columns — the identical dot/(sqrt(na)*sqrt(nb))
    division shape, so the doubles are bit-identical to the inline
    form (proven by the hash-exact oracle gate on every consumer)."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine` — same formula shape;
    list_dot_product iterates sequentially in double after the cast."""
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


# NOTE (round 17): an Arrow/pandas vectorized cosine kernel
# (bit-identical sequential fold in numpy) was built and A/B'd against
# this expression form on the brute-force eval panels at 1x and 10x
# pair volume — and LOST both (noop walls 0.55 vs 0.22 s at 20k pairs,
# 0.73 vs 0.60 s at 200k): shipping two 64-dim double arrays per row
# across the JVM<->Python boundary costs more than the interpreted
# lambda fold it replaces (guide §4.1 — built-ins beat UDFs when they
# exist). The expression form stays the only cosine kernel.
