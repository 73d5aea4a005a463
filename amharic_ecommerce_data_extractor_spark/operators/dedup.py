"""Deduplication suite for large text corpora (graft-added capability —
the operations a 100TB training-data pipeline needs).

* exact_duplicates       — full-content hash groupBy (sha256), keeps the
                           lowest-id representative per group.
* minhash_duplicate_pairs— word-shingle MinHash + LSH banding → candidate
                           pairs → exact Jaccard verify (reuses the linking
                           primitives; scales as an equi join, never O(n²)).
* simhash64              — 64-bit SimHash fingerprint from word-feature signs
                           (pure JVM bit arithmetic); near-dup candidates =
                           identical fingerprints, or banded Hamming buckets.
* ngram_jaccard_pairs    — exact word-n-gram Jaccard on LSH candidates.
* embedding_duplicate_pairs — cosine ≥ τ pairs via SimHash(LSH) bucketing of
                           the embedding space (from operators.similarity).
* dedup                  — end-to-end: drop exact dupes, then one doc per
                           near-dup component (connected components over the
                           verified pair graph).

All group keys are hashes → uniformly distributed, no skew by construction;
the only Python anywhere is zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .linking import banded_candidate_pairs, connected_components, minhash_signature


def word_shingles(col, n: int = 3):
    """Distinct word n-grams (space-joined) of the whitespace-split text;
    texts shorter than n words yield one shingle (the whole text)."""
    words = F.split(F.trim(F.lower(col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return F.array_distinct(grams)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fingerprint, n_copies, keep_id, all_ids) for every duplicated text."""
    fp = df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_copies"),
             F.min("id").alias("keep_id"),
             F.sort_array(F.collect_list("id")).alias("all_ids"))
        .where(F.col("n_copies") > 1)
    )


def minhash_duplicate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Verified near-duplicate pairs (src, dst, jaccard), src < dst.
    Band self-join carries ids only (see linking.banded_candidate_pairs);
    hash_fn='md5' is the cross-engine-verifiable variant."""
    sh = df.select(
        F.col(id_col).alias("nid"),
        word_shingles(F.col(text_col), shingle_words).alias("shingles"),
    ).where(F.size("shingles") > 0)
    # barrier before banding: see linking.lsh_candidate_pairs — prevents the
    # signature from being recomputed per band and per self-join side
    sig_df = sh.withColumn(
        "minhash", minhash_signature(F.col("shingles"), bands * rows, hash_fn)
    ).localCheckpoint()
    return (banded_candidate_pairs(sig_df, bands, rows, hash_fn)
            .where(F.col("sim") >= threshold)
            .withColumnRenamed("sim", "jaccard"))


def ngram_jaccard_pairs(df: DataFrame, n: int = 2, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates (high-recall banding, exact
    verify at the requested n)."""
    return minhash_duplicate_pairs(df, id_col=id_col, text_col=text_col,
                                   shingle_words=n, bands=16, rows=1,
                                   threshold=threshold).withColumnRenamed("jaccard", "ngram_jaccard")


def simhash64(col):
    """64-bit SimHash of word features as a 64-char '0'/'1' string: for each
    bit b, sign of the sum over words of (bit b of xxhash64(word) ? +1 : -1).
    Pure JVM (getbit accepts a column position); the bit-string form is
    directly groupable and band-sliceable (substring) for Hamming buckets,
    with no signed-long overflow concerns."""
    words = F.array_distinct(F.split(F.trim(F.lower(col)), r"\s+"))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.when(
            F.aggregate(
                hashes, F.lit(0),
                lambda acc, h: acc + F.when(F.getbit(h, b) == 1, F.lit(1)).otherwise(F.lit(-1)),
            ) > 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def simhash64_md5(col):
    """Cross-engine-verifiable SimHash64 twin of :func:`simhash64`: the
    per-word hash is md5 instead of xxhash64, with bit b of the 64-bit hash
    read straight out of the hex string — hex digit b//4, bit 3-(b%4) —
    via arithmetic both Spark and DuckDB evaluate identically
    (floor(digit / 2^k) % 2). Used by the driver oracle (q29); the xxhash64
    variant stays the production default (faster JVM hash)."""
    words = F.array_distinct(F.split(F.trim(F.lower(col)), r"\s+"))
    hexes = F.transform(words, lambda w: F.md5(w))

    def vote(hx, b):
        digit = F.conv(F.substring(hx, (b / 4).cast("int") + 1, 1), 16, 10).cast("int")
        bit = F.floor(digit / F.pow(F.lit(2.0), (F.lit(3) - b % 4).cast("double"))).cast("int") % 2
        return F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.when(
            F.aggregate(hexes, F.lit(0), lambda acc, hx: acc + vote(hx, b)) > 0,
            F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def simhash_duplicates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Groups of documents sharing an identical 64-bit SimHash."""
    fp = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("simhash"))
    return (fp.groupBy("simhash")
            .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list("id")).alias("ids"))
            .where(F.col("n_docs") > 1))


def embedding_duplicate_pairs(df: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id", vec_col: str = "embedding",
                              dim: int = 64) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ τ, LSH-bucketed (never a
    full cross join)."""
    from .similarity import knn_lsh

    pairs = knn_lsh(df, df, k=5, dim=dim, id_col=id_col, vec_col=vec_col)
    return (pairs.where((F.col("sim") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
            .select(F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst"), "sim"))


def dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
          threshold: float = 0.7, hash_fn: str = "xxhash64") -> DataFrame:
    """End-to-end dedup: exact first (cheap hash shuffle), then MinHash
    near-dup components; keeps the lowest id per component."""
    hashed = df.withColumn("_fp", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    exact_kept = (hashed.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1).drop("_rn", "_fp"))

    pairs = minhash_duplicate_pairs(exact_kept, id_col=id_col, text_col=text_col,
                                    threshold=threshold, hash_fn=hash_fn)
    comp = connected_components(pairs.select("src", "dst"))
    joined = exact_kept.join(comp, exact_kept[id_col] == comp.node, "left")
    keep = F.coalesce(F.col("component"), F.col(id_col))
    w2 = Window.partitionBy(keep).orderBy(F.col(id_col))
    return (joined.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") == 1)
            .drop("_rn", "node", "component"))
