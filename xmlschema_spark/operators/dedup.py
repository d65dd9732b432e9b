"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the whole point of these shapes):
- exact: one hash-aggregate on a fingerprint — partial+final combine,
  shuffle carries (digest, count) only, never the text.
- MinHash LSH: signatures computed in the scan projection (JVM HOFs);
  the band -> bucket-join turns an O(n^2) all-pairs problem into
  per-bucket candidate pairs. Buckets of size 1 are dropped BEFORE the
  self-join so the shuffle carries only colliding docs.
- candidate pair join is bounded per bucket; a hot bucket (boilerplate
  spam) is capped with a deterministic per-bucket limit rather than
  letting one key explode the join (skew control).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, minhash_signature, shingles, tokens


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups by whole-text fingerprint: one row per
    duplicated doc with its group digest + group size."""
    with_fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    groups = (with_fp.groupBy("fp").agg(F.count(F.lit(1)).alias("group_n"))
              .where(F.col("group_n") > 1))
    return with_fp.join(groups, on="fp", how="inner") \
        .select(id_col, "fp", "group_n")


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       n_hashes: int = 4, k: int = 3) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature table.

    F.inline(array(struct)) is a Generate node: the signature struct is
    computed ONCE per row; plain .select(sig.h0, sig.h1, ...) would
    re-inline (and re-evaluate) the whole expression per column."""
    sig = minhash_signature(F.col(text_col), n_hashes, k)
    return df.select(F.col(id_col), F.inline(F.array(sig)))


def lsh_bucket_pairs(df: DataFrame, text_col: str, id_col: str,
                     n_hashes: int = 4, band_size: int = 2,
                     max_bucket: int = 64) -> DataFrame:
    """Candidate near-dup pairs: band the signature, bucket-join within
    bands, emit ordered (id_a < id_b) distinct pairs.

    max_bucket caps pathological buckets (all-identical boilerplate) so
    one hot key can't quadratically explode the self-join; capped
    buckets keep their lexicographically-first max_bucket members
    (deterministic at any parallelism)."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes)
    n_bands = n_hashes // band_size
    # one scan: per doc, an array of (band, bucket) structs -> explode.
    # Signatures are computed exactly once per document.
    band_structs = []
    for b in range(n_bands):
        cols = [f"h{b * band_size + j}" for j in range(band_size)]
        band_structs.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("bucket")))
    bands = (sigs.select(F.col(id_col).alias("doc"),
                         F.explode(F.array(*band_structs)).alias("bb"))
             .select("doc", "bb.band", "bb.bucket"))
    # ONE shuffle: collect sorted member list per bucket; singleton
    # buckets (the vast majority) die in the HAVING before any join;
    # a deterministic slice caps pathological buckets (skew control).
    grouped = (bands.groupBy("band", "bucket")
               .agg(F.slice(F.array_sort(F.collect_list("doc")),
                            1, max_bucket).alias("docs"),
                    F.count(F.lit(1)).alias("bn"))
               .where(F.col("bn") > 1))
    # ordered pairs generated INSIDE the array — no self-join:
    # flatten(transform(docs, (a,i) -> transform(slice(docs, i+2, n), b -> (a,b))))
    pairs_arr = F.expr(
        "flatten(transform(docs, (a, i) -> "
        "transform(slice(docs, i + 2, size(docs)), b -> struct(a AS id_a, b AS id_b))))")
    return (grouped.select(F.explode(pairs_arr).alias("p"))
            .select(F.col("p.id_a"), F.col("p.id_b"))
            .distinct())


def ngram_jaccard(df: DataFrame, text_col: str, id_col: str,
                  pairs: DataFrame, k: int = 3,
                  threshold: float = 0.0) -> DataFrame:
    """Exact word-k-gram Jaccard for given candidate pairs (verification
    stage after LSH): (id_a, id_b, jaccard)."""
    sh = df.select(F.col(id_col).alias("_id"),
                   F.array_distinct(shingles(F.col(text_col), k)).alias("_sh"))
    j = (pairs
         .join(sh.withColumnRenamed("_id", "id_a")
                 .withColumnRenamed("_sh", "sh_a"), on="id_a")
         .join(sh.withColumnRenamed("_id", "id_b")
                 .withColumnRenamed("_sh", "sh_b"), on="id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(0.0)
    return (j.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def simhash_near_dups(df: DataFrame, text_col: str, id_col: str,
                      max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup pairs: block on the four 16-bit sub-bands (a pair
    within Hamming distance <= 3*16 must collide on >=1 band; for small
    max_hamming this is the standard pigeonhole blocking), then verify
    Hamming distance exactly via bit_count(xor)."""
    from .text import simhash64
    sh = df.select(F.col(id_col).alias("doc"),
                   simhash64(F.col(text_col)).alias("sh"))
    blocks = None
    for b in range(4):
        part = sh.select(
            "doc", "sh", F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("sh"), b * 16)
             .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        blocks = part if blocks is None else blocks.unionByName(part)
    a = blocks.select("band", "key", F.col("doc").alias("id_a"),
                      F.col("sh").alias("sh_a"))
    b_ = blocks.select("band", "key", F.col("doc").alias("id_b"),
                       F.col("sh").alias("sh_b"))
    pairs = (a.join(b_, on=["band", "key"], how="inner")
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                     .alias("hamming"))
             .distinct()
             .where(F.col("hamming") <= max_hamming))
    return pairs


def deduplicate(df: DataFrame, text_col: str, id_col: str,
                method: str = "exact", keep: str = "min_id",
                jaccard_threshold: float = 0.9, k: int = 3) -> DataFrame:
    """Materialize the DEDUPLICATED table (the report operators above
    tell you what's duplicated; this returns the survivors).

    method='exact': group by normalized-text fingerprint, keep one row
    per group (keep='min_id': smallest id — deterministic at any
    parallelism; never 'first', which is shuffle-order dependent).

    method='minhash': LSH candidates -> exact Jaccard >= threshold ->
    connected duplicates collapsed via their MIN id as cluster
    representative (single-link approximation: one anti-join pass
    removes every non-representative member of a duplicate pair; at
    near-identical-dup thresholds the star approximation equals true
    transitive closure for practical corpora — iterate for full
    closure).
    """
    if method == "exact":
        fp = df.withColumn("_fp", fingerprint(F.col(text_col)))
        keeper = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
        return (fp.join(keeper, on=[id_col, "_fp"], how="inner")
                .drop("_fp"))
    if method == "minhash":
        pairs = lsh_bucket_pairs(df, text_col, id_col, n_hashes=4,
                                 band_size=2)
        dups = ngram_jaccard(df, text_col, id_col, pairs, k=k,
                             threshold=jaccard_threshold)
        # id_a < id_b by construction: every id_b in a qualifying pair
        # is a non-representative duplicate
        losers = dups.select(F.col("id_b").alias(id_col)).distinct()
        return df.join(losers, on=id_col, how="left_anti")
    raise ValueError(f"unknown dedup method {method!r}")
