"""q-digest: canonical determinism, rank guarantee, mergeability."""

import random

import pytest
from pyspark.sql import functions as F

from xmlschema_spark.operators.sketch import (compress_counts, merge_digests,
                                              qdigest, qdigest_quantiles)

L, K = 10, 32          # 1024 leaves


def _digest_rows(df):
    return sorted((r.level, r.node, r.cnt) for r in df.collect())


def test_compress_counts_pure_function():
    """Same multiset of rows in any order -> same digest."""
    rows = [(0, (1 << L) + i % 100, 1) for i in range(1000)]
    a = compress_counts(rows, L, K)
    b = compress_counts(list(reversed(rows)), L, K)
    assert sorted(a) == sorted(b)
    assert sum(c for _, _, c in a) == 1000


def test_qdigest_parallelism_invariant(spark):
    data = [(random.Random(7).randrange(1 << L),) for _ in range(5000)]
    df = spark.createDataFrame(data, "v long")
    d1 = _digest_rows(qdigest(df.repartition(2), F.col("v"), L, K))
    d2 = _digest_rows(qdigest(df.repartition(13), F.col("v"), L, K))
    assert d1 == d2
    assert sum(c for _, _, c in d1) == 5000


def test_qdigest_heavy_hitter_stays_at_leaf(spark):
    """A value heavier than n/k must survive at leaf resolution."""
    rows = [(42,)] * 500 + [(i,) for i in range(200)]
    df = spark.createDataFrame(rows, "v long")
    digest = _digest_rows(qdigest(df, F.col("v"), L, K))
    assert (0, (1 << L) + 42, 501) in digest


def test_qdigest_rank_guarantee(spark):
    """Quantile read-off has rank error <= levels * floor(n/k)."""
    rng = random.Random(11)
    vals = sorted(rng.randrange(1 << L) for _ in range(20000))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    digest = qdigest(df, F.col("v"), L, K)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    out = {r.quantile: r.leaf_hi
           for r in qdigest_quantiles(digest, qs, L).collect()}
    n = len(vals)
    bound = L * (n // K)
    for q in qs:
        target = -(-int(q * n) // 1)  # ceil
        # rank of the reported value (right edge): # of values <= leaf_hi
        import bisect
        rank = bisect.bisect_right(vals, out[q])
        assert abs(rank - q * n) <= bound + 1, (q, rank, q * n, bound)


def test_merge_matches_direct_on_counts(spark):
    """Merged partial digests: total mass preserved, deterministic, and
    quantiles still within the rank bound of the DIRECT digest's."""
    rng = random.Random(3)
    vals = [rng.randrange(1 << L) for _ in range(8000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    half1 = df.where(F.col("v") % 2 == 0)
    half2 = df.where(F.col("v") % 2 == 1)
    d1 = qdigest(half1, F.col("v"), L, K)
    d2 = qdigest(half2, F.col("v"), L, K)
    merged = merge_digests([d1, d2], L, K)
    rows = _digest_rows(merged)
    assert sum(c for _, _, c in rows) == len(vals)
    # determinism of the merge itself
    rows2 = _digest_rows(merge_digests([d2, d1], L, K))
    assert rows == rows2
    import bisect
    svals = sorted(vals)
    out = {r.quantile: r.leaf_hi
           for r in qdigest_quantiles(merged, [0.5], L).collect()}
    rank = bisect.bisect_right(svals, out[0.5])
    # merge of compressed partials doubles the per-level slack
    assert abs(rank - 0.5 * len(vals)) <= 2 * L * (len(vals) // K) + 1


def test_empty_input(spark):
    df = spark.createDataFrame([], "v long")
    assert qdigest(df, F.col("v"), L, K).count() == 0
