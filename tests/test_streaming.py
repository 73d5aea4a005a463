"""Structured Streaming: incremental triple extraction and windowed vendor
activity, drained with Trigger.AvailableNow and compared to batch output."""

from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.data.synthetic import generate_messages
from amharic_ecommerce_data_extractor_spark.operators.extract import extract_entities
from amharic_ecommerce_data_extractor_spark.operators.triples import emit_triples
from amharic_ecommerce_data_extractor_spark.streaming.stream import (
    read_message_stream,
    run_stream_once,
    streaming_triples,
    windowed_vendor_activity,
)


def test_streaming_triples_match_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    msgs = generate_messages(spark, n_rows=200, n_vendors=8)
    msgs.write.parquet(src)

    stream = streaming_triples(read_message_stream(spark, src, max_files_per_trigger=2))
    assert stream.isStreaming
    run_stream_once(stream, out, ck)

    got = {tuple(r) for r in spark.read.parquet(out)
           .select("subj", "pred", "obj", "message_id").collect()}
    want = {tuple(r) for r in emit_triples(extract_entities(spark.read.parquet(src)))
            .select("subj", "pred", "obj", "message_id").collect()}
    assert got == want and len(got) > 0


def test_streaming_resume_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    generate_messages(spark, n_rows=100, n_vendors=5).write.parquet(src)
    run_stream_once(streaming_triples(read_message_stream(spark, src)), out, ck)
    n1 = spark.read.parquet(out).count()

    # append a second batch of files; restart drains only the delta
    generate_messages(spark, n_rows=60, n_vendors=5).withColumn(
        "message_id", F.col("message_id") + 1_000_000
    ).write.mode("append").parquet(src)
    run_stream_once(streaming_triples(read_message_stream(spark, src)), out, ck)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1
    # no duplicates for the original ids
    dup = (spark.read.parquet(out)
           .groupBy("subj", "pred", "obj", "message_id").count()
           .where(F.col("count") > 1).count())
    assert dup == 0


def test_windowed_vendor_activity(spark, tmp_path):
    src = str(tmp_path / "in")
    generate_messages(spark, n_rows=150, n_vendors=5).write.parquet(src)
    agg = windowed_vendor_activity(read_message_stream(spark, src))
    assert agg.isStreaming
    out = str(tmp_path / "winout")
    ck = str(tmp_path / "winck")
    q = (agg.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # watermark append-mode may hold back the tail window; totals bounded by input
    got = spark.read.parquet(out)
    assert got.columns == ["window_start", "vendor", "n_posts", "views"]


def test_stateful_vendor_totals(spark, tmp_path):
    from amharic_ecommerce_data_extractor_spark.streaming.stream import (
        run_stream_once_foreach,
        stateful_vendor_totals,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    first = generate_messages(spark, n_rows=120, n_vendors=4)
    first.write.parquet(src)
    q = stateful_vendor_totals(read_message_stream(spark, src))
    run_stream_once_foreach(q, out, ck)
    got1 = {r["vendor"]: r for r in spark.read.parquet(out).collect()}

    # state persists across a restart with new files: totals grow
    second = generate_messages(spark, n_rows=60, n_vendors=4).withColumn(
        "message_id", F.col("message_id") + 5_000_000)
    second.write.mode("append").parquet(src)
    q2 = stateful_vendor_totals(read_message_stream(spark, src))
    run_stream_once_foreach(q2, out, ck)
    # latest row per vendor carries cumulative counts == batch totals
    rows = spark.read.parquet(out).groupBy("vendor").agg(
        F.max("n_posts").alias("n_posts")).collect()
    got2 = {r["vendor"]: r["n_posts"] for r in rows}
    want = {r["repo"]: r["cnt"] for r in
            spark.read.parquet(src).groupBy("repo").agg(F.count("*").alias("cnt")).collect()}
    assert got2 == want
    assert all(got2[v] >= got1[v]["n_posts"] for v in got1)


def test_rules_jvm_backend_builds_streaming_plan(spark, tmp_path):
    # the rules_jvm extraction barrier (localCheckpoint) must be skipped on
    # streaming inputs — checkpoint is unsupported there and this backend is
    # the no-Python-worker fallback streaming deployments would pick
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    generate_messages(spark, n_rows=60, n_vendors=5).write.parquet(src)

    stream = extract_entities(read_message_stream(spark, src), backend="rules_jvm")
    assert stream.isStreaming
    run_stream_once(stream.select("message_id", "products", "prices"), out, ck)
    got = spark.read.parquet(out)
    assert got.count() == 60
    batch = extract_entities(spark.read.parquet(src), backend="rules_jvm")

    def rows(df):
        return {(r["message_id"], tuple(r["products"]), tuple(r["prices"]))
                for r in df.select("message_id", "products", "prices").collect()}

    assert rows(got) == rows(batch)


def test_streaming_exact_dedup_within_watermark(spark, tmp_path):
    from amharic_ecommerce_data_extractor_spark.streaming.stream import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    msgs = generate_messages(spark, n_rows=120, n_vendors=6)
    # replay 40 of the messages with new ids (same content, same event time):
    # classic double-ingest; all replays fall inside the watermark horizon
    replay = (msgs.limit(40)
              .withColumn("message_id", F.col("message_id") + 5_000_000))
    msgs.unionByName(replay).repartition(6).write.parquet(src)

    # watermark wider than the synthetic corpus's event-time span: files
    # arrive in arbitrary (non-chronological) order across micro-batches, and
    # a narrow watermark would discard whole later batches as late data —
    # here we pin the DEDUP semantics; state eviction is the operational knob
    stream = streaming_exact_dedup(
        read_message_stream(spark, src, max_files_per_trigger=2),
        watermark="10000 days")
    run_stream_once(stream, out, ck)
    got = spark.read.parquet(out)

    n_distinct_contents = msgs.select("content").distinct().count()
    assert got.count() == n_distinct_contents
    assert got.select("content").distinct().count() == n_distinct_contents


def test_rules_jvm_fused_unbarriered_plan_bounded(spark, tmp_path):
    # no barrier is possible on streaming plans, so the fused emit_triples
    # composition inlines the automaton once per entity-column reference —
    # LINEAR in reference count, not the exponential union re-expansion the
    # barrier guards against. A streaming DF refuses optimizedPlan before
    # start(), so pin the property on the identical-shape batch plan with
    # the barrier bypassed (with_entities_expr called directly).
    from amharic_ecommerce_data_extractor_spark.functions.extract_expr import (
        with_entities_expr,
    )
    from amharic_ecommerce_data_extractor_spark.functions.textnorm import (
        preprocess_expr,
    )
    from amharic_ecommerce_data_extractor_spark.operators.triples import emit_triples

    m = generate_messages(spark, n_rows=20, n_vendors=3)
    unbarriered = with_entities_expr(
        m.withColumn("preprocessed_text", preprocess_expr(F.col("content"))),
        clean_col="preprocessed_text")
    fused = emit_triples(unbarriered)
    plan_len = len(fused._jdf.queryExecution().optimizedPlan().toString())
    assert plan_len < 500_000, f"fused unbarriered rules_jvm plan exploded: {plan_len}"
