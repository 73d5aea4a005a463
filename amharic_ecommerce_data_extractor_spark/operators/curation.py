"""Training-corpus curation pipeline (graft-added): the standard sequence a
100TB pretraining-data pipeline runs over a raw document pool —

    exact dedup → near-dup dedup (MinHash-LSH components)
    → language ID → quality scoring → length/token budget filters
    → per-source caps — with a full audit of what each step dropped.

Composes the engine's own primitives (operators.dedup, functions.textstats);
everything is hash-keyed shuffles and narrow column expressions — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions import textstats as ts
from .dedup import dedup


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    near_dup_threshold: float = 0.8,
    per_source_cap: int | None = None,
    source_col: str = "source",
    hash_fn: str = "xxhash64",
    pair_mode: str = "star",
    dedup_method: str = "minhash",
    winnow_min_shared: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated_docs, audit). audit: one row per stage with rows
    surviving — the per-stage lineage a data steward reads.
    hash_fn='md5' makes the near-dup stage cross-engine reproducible
    (see linking.minhash_signature). pair_mode='star' (default) keeps the
    near-dup candidate-edge count linear in duplicate-cluster size — the
    100 TB-safe setting for the CC consumer (see dedup.dedup); 'all' trades
    O(bucket²) edges for full verification recall on similarity chains.
    dedup_method='winnowing' swaps the near-dup edge source from MinHash
    resemblance to MOSS fingerprint overlap (verbatim-run containment —
    catches boilerplate-level copying; see dedup.dedup). NOTE:
    near_dup_threshold and pair_mode govern the MINHASH method only; the
    winnowing method is tuned by winnow_min_shared (its edge bar) and
    ignores both — passing them alongside dedup_method='winnowing' has no
    effect."""
    # each stage is persisted before the audit count — otherwise every
    # count() action recomputes the whole upstream chain (incl. MinHash+CC).
    # The raw input is persisted too: the audit's "input" count is the action
    # that populates the cache, and the dedup stage (which reads the input
    # several times: exact-hash pass + shingle pass) then reads the cached
    # copy instead of rescanning the source — one source scan total.
    # persist/unpersist is not refcounted in Spark: if the CALLER already
    # persisted docs (for their own reuse), persisting again is a no-op and
    # unpersisting at the end would silently evict the caller's cache — so
    # the input cache is only taken (and later released) when we created it.
    caller_cached = docs.storageLevel.useMemory or docs.storageLevel.useDisk
    if not caller_cached:
        # spread BEFORE persisting: the cache freezes the partitioning, and a
        # one-split scan cached as one partition would run every downstream
        # CPU-heavy stage (shingle/fingerprint hashing) on one core. spread's
        # static gate makes this the identity on well-partitioned input
        # (including everything at 100 TB); a caller-cached frame keeps the
        # caller's partitioning — repartitioning it would defeat their cache.
        from .linking import spread

        docs = spread(docs, id_col).persist()
    deduped = filtered = curated = None
    try:
        stages: list[tuple[str, DataFrame]] = [("input", docs)]

        deduped = dedup(docs, id_col=id_col, text_col=text_col,
                        threshold=near_dup_threshold, hash_fn=hash_fn,
                        pair_mode=pair_mode, method=dedup_method,
                        winnow_min_shared=winnow_min_shared).persist()
        stages.append(("dedup", deduped))

        scored = deduped.withColumn("quality", ts.quality_score(F.col(text_col))) \
                        .withColumn("n_tokens", ts.whitespace_token_count(F.col(text_col))) \
                        .withColumn("script", ts.detect_script(F.col(text_col)))
        filtered = scored.where(
            (F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)).persist()
        stages.append(("quality_and_length", filtered))

        curated = filtered
        if per_source_cap is not None and source_col in docs.columns:
            w = Window.partitionBy(source_col).orderBy(F.desc("quality"), F.asc(id_col))
            curated = (filtered.withColumn("_rn", F.row_number().over(w))
                       .where(F.col("_rn") <= per_source_cap).drop("_rn"))
            stages.append(("per_source_cap", curated))

        spark = docs.sparkSession
        audit = spark.createDataFrame(
            [(i, name, df.count()) for i, (name, df) in enumerate(stages)],
            "stage_idx int, stage string, rows_surviving long")
        curated = curated.persist()
        curated.count()  # materialize before releasing the upstream caches
    except BaseException:
        # release every cache this call created; `curated is filtered` when
        # no per-source cap applied (persist() returns self), so dedupe by
        # identity to avoid double-unpersist of the same frame
        created = [] if caller_cached else [docs]
        for df_ in (deduped, filtered, curated):
            if df_ is not None and not any(df_ is c for c in created):
                created.append(df_)
        for df_ in created:
            df_.unpersist()
        raise
    if not caller_cached:
        docs.unpersist()
    deduped.unpersist()
    if curated is not filtered:
        # without a per-source cap, curated IS the filtered frame (persist()
        # returns self) — unpersisting it here would silently drop the cache
        # just materialized and make the caller's first action recompute the
        # whole dedup pipeline
        filtered.unpersist()
    return curated, audit


def token_budget_report(curated: DataFrame, text_col: str = "text",
                        by: str | None = "source") -> DataFrame:
    """Token accounting for training budgeting: whitespace + BPE-ish counts
    per group."""
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(ts.whitespace_token_count(F.col(text_col))).alias("ws_tokens"),
        F.sum(ts.bpe_ish_token_count(F.col(text_col))).alias("bpe_ish_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    ]
    return curated.groupBy(by).agg(*aggs) if by else curated.agg(*aggs)
