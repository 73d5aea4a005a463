"""Structured Streaming variants of the pipeline (the reference is all batch
— SURVEY.md §2.11; this is the file-arrival incremental mode the engine adds).

The extraction operator is stateless, so the SAME fused mapInPandas kernel
runs unchanged on a streaming DataFrame; triple emission is stateless too.
Windowed vendor activity uses event-time windows + watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..data.synthetic import MESSAGE_SCHEMA
from ..operators.extract import extract_entities
from ..operators.triples import emit_triples


def read_message_stream(spark: SparkSession, input_dir: str,
                        max_files_per_trigger: int = 16) -> DataFrame:
    return (spark.readStream.schema(MESSAGE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def streaming_triples(messages: DataFrame) -> DataFrame:
    """Stateless stream: content → entities → triples, incrementally."""
    return emit_triples(extract_entities(messages))


def windowed_vendor_activity(messages: DataFrame, window: str = "1 day",
                             watermark: str = "2 days") -> DataFrame:
    """Event-time tumbling-window post counts per vendor with late-data
    handling (watermark bounds state)."""
    return (
        messages.withWatermark("message_date", watermark)
        .groupBy(F.window("message_date", window).alias("w"), F.col("repo").alias("vendor"))
        .agg(F.count("*").alias("n_posts"),
             F.sum(F.coalesce("views", F.lit(0))).alias("views"))
        .select(F.col("w.start").alias("window_start"), "vendor", "n_posts", "views")
    )


def run_stream_once(messages: DataFrame, out_dir: str, checkpoint_dir: str,
                    mode: str = "append"):
    """Drain all available input (Trigger.AvailableNow) into parquet and
    stop — the batch-parity execution mode used in tests; in production the
    same query runs continuously."""
    q = (messages.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode(mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stateful_vendor_totals(messages: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per
    vendor, a running (n_posts, total_views, last_seen) state maintained
    across micro-batches — the incremental twin of the scorecard's
    per-vendor counters. State is one small row per vendor (bounded), emitted
    on every batch that touches the vendor."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState

    out_schema = T.StructType([
        T.StructField("vendor", T.StringType(), False),
        T.StructField("n_posts", T.LongType(), False),
        T.StructField("total_views", T.LongType(), False),
        T.StructField("last_seen", T.TimestampType(), True),
    ])
    state_schema = T.StructType([
        T.StructField("n_posts", T.LongType(), False),
        T.StructField("total_views", T.LongType(), False),
        T.StructField("last_seen", T.TimestampType(), True),
    ])

    def update(key, pdfs, state: GroupState):
        n, views, last = (state.get if state.exists else (0, 0, None))
        for pdf in pdfs:
            n += len(pdf)
            views += int(pdf["views"].fillna(0).sum())
            # pandas .max() over an all-null batch yields NaT, not None, and
            # NaT comparisons are always False — guard with pd.notna so an
            # all-null first batch can't pin last_seen past later real
            # timestamps (matches the oracle's null-ignoring max(ts))
            batch_last = pdf["message_date"].max()
            if pd.notna(batch_last) and (last is None or pd.isna(last)
                                         or batch_last > last):
                last = batch_last
        if last is not None and pd.isna(last):
            last = None
        state.update((n, views, last))
        yield pd.DataFrame([{"vendor": key[0], "n_posts": n,
                             "total_views": views, "last_seen": last}])

    return (messages
            .select(F.col("repo"), F.col("views"), F.col("message_date"))
            .groupBy("repo")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    outputMode="update", timeoutConf="NoTimeout"))


def run_stream_once_foreach(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain an update-mode stream (e.g. stateful operators) into parquet via
    foreachBatch append — parquet has no native update sink."""
    q = (df.writeStream
         .foreachBatch(lambda batch, _id: batch.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def streaming_exact_dedup(messages: DataFrame, watermark: str = "2 days",
                          text_col: str = "content",
                          event_time_col: str = "message_date") -> DataFrame:
    """Dedup-on-ingest: drop exact-content duplicates incrementally.

    Representative rule differs from the batch twin by necessity:
    operators.dedup.exact_duplicates keeps the LOWEST-id row per content
    (deterministic, order-free), while a stream can only keep the
    FIRST-ARRIVING row — under out-of-order ingest the two paths may keep
    different representatives of the same content. Downstream logic keyed on
    the surviving row id must not assume they agree; content-keyed logic is
    unaffected.

    Shape: sha256(content) is the dedup key — uniformly distributed, no
    skew — and `dropDuplicatesWithinWatermark` keeps one row per key while
    the watermark BOUNDS THE STATE: a key older than the watermark is
    evicted, so state size is O(arrival rate × watermark), not O(corpus).
    That is the standard 100 TB ingest pattern — exact global dedup is the
    batch job's responsibility (operators.dedup), the stream guards the
    door against replays/reposts inside the watermark horizon.

    Late-data caveat (standard watermark semantics, easy to trip in tests):
    rows whose event time is already older than the advanced watermark are
    DROPPED entirely, not just un-deduplicated — size the watermark to the
    real arrival skew (event-time lag), not to the dedup horizon you wish
    for.
    """
    return (messages
            .withColumn("_fp", F.sha2(F.col(text_col), 256))
            .withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["_fp"])
            .drop("_fp"))
