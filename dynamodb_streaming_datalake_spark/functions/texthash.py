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

import pandas as pd
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


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine` — same formula shape;
    list_dot_product iterates sequentially in double after the cast."""
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


def _fold_prefix_cosines(pa_arr, pb_arr, prefixes):
    """Vectorized twin of :func:`cosine` over a batch of row pairs,
    evaluated at each prefix length in ``prefixes``.

    Bit-identity contract: each of dot/na/nb is accumulated dim by dim
    in IEEE double, exactly the left-to-right fold the JVM expression
    performs (``acc[:, j] += x * y`` is elementwise ``s = s + v`` in the
    same order), ``sqrt`` is correctly rounded in both runtimes, and a
    zero denominator maps to NULL — Spark's non-ANSI ``x / 0.0``.
    Returns a list (len n) of lists (len(prefixes)) of float|None.
    """
    import numpy as np

    n = len(pa_arr)
    out = [[None] * len(prefixes) for _ in range(n)]
    # bucket rows by (len_a, len_b): equal-length pairs vectorize as one
    # matrix; a length mismatch is NULL under zip_with's null padding
    groups: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        a, b = pa_arr[i], pb_arr[i]
        if a is None or b is None:
            continue
        groups.setdefault((len(a), len(b)), []).append(i)
    for (la, lb), idxs in groups.items():
        if la != lb:
            continue  # zip_with pads with null -> fold -> NULL
        A = np.empty((len(idxs), la), dtype=np.float64)
        B = np.empty((len(idxs), la), dtype=np.float64)
        for r, i in enumerate(idxs):
            A[r, :] = pa_arr[i]
            B[r, :] = pb_arr[i]
        dot = np.zeros(len(idxs))
        na = np.zeros(len(idxs))
        nb = np.zeros(len(idxs))
        snap = {}
        bounds = sorted({min(p, la) for p in prefixes})
        d0 = 0
        for bound in bounds:
            for j in range(d0, bound):
                x = A[:, j]
                y = B[:, j]
                dot += x * y
                na += x * x
                nb += y * y
            d0 = bound
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                c = dot / denom
            snap[bound] = (c, denom)
        for r, i in enumerate(idxs):
            row = out[i]
            for k, p in enumerate(prefixes):
                c, denom = snap[min(p, la)]
                row[k] = None if denom[r] == 0.0 else float(c[r])
    return out


def cosine_vec(a: Column, b: Column) -> Column:
    """Arrow-vectorized drop-in for :func:`cosine` (guide §4.2): same
    bit-identical sequential fold, executed as one numpy pass per Arrow
    batch instead of an interpreted per-element lambda chain. Use on
    row-heavy cosine stages (brute-force eval panels, centroid
    assignment); the expression form stays the right tool for small
    frames where a Python round-trip would dominate."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(pa: pd.Series, pb: pd.Series) -> pd.Series:
        vals = _fold_prefix_cosines(pa.to_list(), pb.to_list(), (1 << 30,))
        return pd.Series([v[0] for v in vals], dtype="object")

    return _cos(a, b)


def cosine_prefixes_vec(a: Column, b: Column, prefixes) -> Column:
    """All prefix-length cosines of one pair in a single sequential
    pass (``array<double>``, ordered as ``prefixes``): the fold snapshots
    dot/na/nb at each boundary, so ``out[k]`` is bit-identical to
    ``cosine(slice(a, 1, p_k), slice(b, 1, p_k))`` at a single crossing
    of the Python boundary instead of one per prefix."""
    from pyspark.sql.functions import pandas_udf

    prefixes = tuple(int(p) for p in prefixes)

    @pandas_udf("array<double>")
    def _cosp(pa: pd.Series, pb: pd.Series) -> pd.Series:
        return pd.Series(
            _fold_prefix_cosines(pa.to_list(), pb.to_list(), prefixes)
        )

    return _cosp(a, b)
