"""Bucketed extract checkpoint (pipeline stage 1b): the write-once-shuffle-
never-again layout, pinned at the PIPELINE level.

* the bucketed finalize stage writes an external bucketed catalog table at
  the stage's own data path and resumes across sessions via DDL
  re-registration (catalog metadata is session-lossy, files are not);
* the predictions ⋈ metadata join of the reference scorecard path
  (operators/rollup.py join_message_meta, reference vendor_scorecard.py
  64-67) plans EXCHANGE-FREE off that checkpoint — groupBy(message_id) and
  the message_id equi-join both reuse the persisted hash distribution;
* the same join off the plain (chunk-union parquet) extract checkpoint DOES
  shuffle — the absence above is a property of the layout, not the checker.
"""

import os

import pytest
from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.plans.pipeline import run_pipeline
from amharic_ecommerce_data_extractor_spark.sources import checkpoint as ckpt
from amharic_ecommerce_data_extractor_spark.sources.bucketed import (
    is_shuffle_free_join,
)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _j1_join(extracted):
    """The J1 shape: per-message entity rollup joined back onto message
    metadata on message_id — both sides derived from the extract table."""
    meta = extracted.select("message_id", "repo", "views")
    ents = (extracted.select("message_id", F.explode_outer("products").alias("token"))
            .groupBy("message_id")
            .agg(F.array_sort(F.array_distinct(F.collect_list("token")))
                 .alias("products")))
    return meta.join(ents, "message_id")


def test_bucketed_extract_checkpoint_j1_exchange_free(spark, tmp_path, no_broadcast):
    workdir = str(tmp_path / "kg")
    summary = run_pipeline(spark, workdir, n_messages=600, n_chunks=2,
                           n_buckets=4)
    assert summary["triples"] > 0

    # the pipeline's canonical extract read: the bucketed catalog table
    bdir = os.path.join(workdir, "extract_bucketed")
    extracted = ckpt.run_stage(spark, workdir, "extract_bucketed",
                               lambda: (_ for _ in ()).throw(
                                   AssertionError("must resume, not rebuild")),
                               bucket_by=("message_id", 4))
    j = _j1_join(extracted)
    j.write.format("noop").mode("overwrite").save()
    assert is_shuffle_free_join(j), \
        j._jdf.queryExecution().executedPlan().toString()

    # control: the identical join off the plain chunk-union checkpoint
    # (no bucket metadata) re-shuffles both sides
    plain = spark.read.parquet(os.path.join(workdir, "extract", "chunk=*", "data"))
    pj = _j1_join(plain)
    pj.write.format("noop").mode("overwrite").save()
    assert not is_shuffle_free_join(pj)

    # values equal either way
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, pj.collect()))

    # cross-session resume: drop the catalog entry (what a fresh JVM looks
    # like), resume must re-register by DDL and keep the exchange-free plan
    table = ckpt._bucket_table_name(bdir)
    spark.sql(f"DROP TABLE {table}")
    resumed = ckpt.run_stage(spark, workdir, "extract_bucketed",
                             lambda: (_ for _ in ()).throw(
                                 AssertionError("must resume, not rebuild")),
                             bucket_by=("message_id", 4))
    rj = _j1_join(resumed)
    rj.write.format("noop").mode("overwrite").save()
    assert is_shuffle_free_join(rj), \
        rj._jdf.queryExecution().executedPlan().toString()
    assert resumed.count() == extracted.count()

    # resume with a mismatched bucket spec hard-fails (silent re-read with
    # the wrong assumed distribution would corrupt join results)
    with pytest.raises(ValueError, match="bucketed-checkpoint resume mismatch"):
        ckpt.run_stage(spark, workdir, "extract_bucketed", lambda: None,
                       bucket_by=("message_id", 8))


def test_bucketed_groupby_off_checkpoint_skips_exchange(spark, tmp_path,
                                                        no_broadcast):
    """groupBy on the bucket key off the checkpoint plans without its
    exchange (bucketing IS persisted hash partitioning)."""
    df = spark.range(3000).select(
        F.col("id").alias("message_id"), (F.col("id") % 13).alias("vendor"))
    workdir = str(tmp_path / "wd")
    out = ckpt.run_stage(spark, workdir, "s", lambda: df,
                         bucket_by=("message_id", 4))
    agg = out.groupBy("message_id").agg(F.count("*").alias("n"))
    agg.write.format("noop").mode("overwrite").save()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == 3000


def test_gc_chunk_dirs_after_bucketed_finalize(spark, tmp_path):
    """The 2× extract-storage reclaim: once the bucketed finalize is
    committed, the chunk resume dirs can be deleted; a pipeline re-run
    resumes off the finalize without recomputing (and without the chunk
    dirs); a direct chunked_stage call on the collected dir fails loudly."""
    import json as _json

    workdir = str(tmp_path / "kg")
    summary = run_pipeline(spark, workdir, n_messages=400, n_chunks=2,
                           n_buckets=4)

    extract_dir = os.path.join(workdir, "extract")
    assert sorted(d for d in os.listdir(extract_dir) if d.startswith("chunk="))

    # refuses while the finalize marker is absent
    import shutil
    fin_dir = os.path.join(workdir, "extract_bucketed")
    marker = os.path.join(fin_dir, ckpt.MARKER)
    saved = open(marker, encoding="utf-8").read()
    os.remove(marker)
    with pytest.raises(ValueError, match="no marker"):
        ckpt.gc_chunk_dirs(workdir, "extract", "extract_bucketed")
    with open(marker, "w", encoding="utf-8") as f:
        f.write(saved)

    # refuses on a row-count disagreement (never delete the copy that
    # still has the rows)
    tampered = dict(_json.loads(saved)); tampered["rows"] += 1
    with open(marker, "w", encoding="utf-8") as f:
        _json.dump(tampered, f)
    with pytest.raises(ValueError, match="refusing to delete"):
        ckpt.gc_chunk_dirs(workdir, "extract", "extract_bucketed")
    with open(marker, "w", encoding="utf-8") as f:
        f.write(saved)

    removed = ckpt.gc_chunk_dirs(workdir, "extract", "extract_bucketed")
    assert len(removed) == 2
    assert not [d for d in os.listdir(extract_dir) if d.startswith("chunk=")]
    # idempotent
    assert ckpt.gc_chunk_dirs(workdir, "extract", "extract_bucketed") == []

    # re-run resumes off the finalize: same outputs, extract never rebuilt
    again = run_pipeline(spark, workdir, n_messages=400, n_chunks=2,
                         n_buckets=4)
    assert again["triples"] == summary["triples"]
    assert again["nodes"] == summary["nodes"]
    assert "extract" not in again["stage_seconds"]  # build closure skipped

    # a direct chunked_stage call on the collected dir fails loudly
    with pytest.raises(ValueError, match="garbage-collected"):
        ckpt.chunked_stage(spark, workdir, "extract",
                           spark.range(5).withColumnRenamed("id", "message_id"),
                           lambda df: df, n_chunks=2)
