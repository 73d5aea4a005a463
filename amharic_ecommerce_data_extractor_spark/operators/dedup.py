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

from .linking import band_keys, connected_components, minhash_signature


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
) -> DataFrame:
    """Verified near-duplicate pairs (src, dst, jaccard), src < dst."""
    sh = df.select(
        F.col(id_col).alias("nid"),
        word_shingles(F.col(text_col), shingle_words).alias("shingles"),
    ).where(F.size("shingles") > 0)
    # barrier before banding: see linking.lsh_candidate_pairs — prevents the
    # signature from being recomputed per band and per self-join side
    sig_df = sh.withColumn(
        "minhash", minhash_signature(F.col("shingles"), bands * rows)
    ).localCheckpoint()
    banded = sig_df.select(
        "nid", "shingles",
        F.explode(band_keys(F.col("minhash"), bands, rows)).alias("bk"),
    ).select("nid", "shingles", "bk.band", "bk.sig")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on=["band", "sig"])
        .where(F.col("a.nid") < F.col("b.nid"))
        .select(F.col("a.nid").alias("src"), F.col("b.nid").alias("dst"),
                F.col("a.shingles").alias("sa"), F.col("b.shingles").alias("sb"))
        .dropDuplicates(["src", "dst"])
    )
    jac = F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb"))
    return (cand.withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("src", "dst", "jaccard"))


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
          threshold: float = 0.7) -> DataFrame:
    """End-to-end dedup: exact first (cheap hash shuffle), then MinHash
    near-dup components; keeps the lowest id per component."""
    hashed = df.withColumn("_fp", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    exact_kept = (hashed.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1).drop("_rn", "_fp"))

    pairs = minhash_duplicate_pairs(exact_kept, id_col=id_col, text_col=text_col,
                                    threshold=threshold)
    comp = connected_components(pairs.select("src", "dst"))
    joined = exact_kept.join(comp, exact_kept[id_col] == comp.node, "left")
    keep = F.coalesce(F.col("component"), F.col(id_col))
    w2 = Window.partitionBy(keep).orderBy(F.col(id_col))
    return (joined.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") == 1)
            .drop("_rn", "node", "component"))
