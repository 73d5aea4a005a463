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
