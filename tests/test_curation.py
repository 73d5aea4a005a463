"""Corpus-curation pipeline over documents: dedup → quality/length filters →
per-source caps, with per-stage audit."""

from amharic_ecommerce_data_extractor_spark.operators.curation import (
    curate,
    token_budget_report,
)


def test_curate_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # duplicate the corpus so dedup has real work
    from pyspark.sql import functions as F

    pool = docs.unionByName(docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"))
    curated, audit = curate(pool, min_quality=0.3, min_tokens=5, per_source_cap=40)
    stages = {r["stage"]: r["rows_surviving"] for r in audit.collect()}
    assert stages["input"] == pool.count()
    assert stages["dedup"] <= docs.count()         # exact dupes collapse
    assert stages["quality_and_length"] <= stages["dedup"]
    assert stages["per_source_cap"] <= stages["quality_and_length"]
    assert curated.count() == stages["per_source_cap"]
    # caps respected
    per_src = curated.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert per_src <= 40
    # audit columns carried
    assert {"quality", "n_tokens", "script"} <= set(curated.columns)

    rep = token_budget_report(curated).collect()[0]
    assert rep["ws_tokens"] > 0 and rep["bpe_ish_tokens"] >= rep["ws_tokens"]


def test_curate_preserves_caller_cache(spark, sf_dir):
    """persist/unpersist is not refcounted: curate() must not evict a cache
    the CALLER created on the input frame (it only releases caches it took
    itself)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    try:
        docs.count()
        curated, audit = curate(docs, min_quality=0.0, min_tokens=1)
        audit.collect()
        lvl = docs.storageLevel
        assert lvl.useMemory or lvl.useDisk, \
            "curate() evicted the caller's cache on the input frame"
        assert curated.count() > 0
    finally:
        docs.unpersist()
