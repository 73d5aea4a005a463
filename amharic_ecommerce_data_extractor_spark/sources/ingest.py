"""File ingestion: format registry + ZIP-of-CSVs source (reference S6,
``src/data_ingestion/zip_ingestor.py:33-128``).

The reference's abstract-factory class hierarchy becomes a plain format
registry over ``spark.read``; the ZIP member extraction happens driver-side
(zip is not a splittable format) into a scratch dir, then ALL member CSVs are
read as one multi-file scan — Spark parallelizes across files, which IS the
reference's concat (U1) without the driver-memory materialization.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

_READERS = {
    "csv": lambda spark, path, **kw: spark.read.options(header=True, inferSchema=True, **kw).csv(path),
    "json": lambda spark, path, **kw: spark.read.options(**kw).json(path),
    "parquet": lambda spark, path, **kw: spark.read.options(**kw).parquet(path),
    "text": lambda spark, path, **kw: spark.read.options(**kw).text(path),
    "conll": None,  # dispatched to sources.conll.read_conll below
}


def read_any(spark: SparkSession, path: str, fmt: str | None = None, **kw) -> DataFrame:
    """Format-dispatched read; fmt defaults to the file extension."""
    if fmt is None:
        fmt = os.path.splitext(path)[1].lstrip(".").lower() or "parquet"
    if fmt == "zip":
        return read_zip_of_csvs(spark, path, **kw)
    if fmt == "conll":
        from .conll import read_conll

        return read_conll(spark, path, **kw)
    if fmt not in _READERS or _READERS[fmt] is None:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(_READERS)}")
    return _READERS[fmt](spark, path, **kw)


def read_zip_of_csvs(spark: SparkSession, zip_path: str,
                     scratch_dir: str | None = None, **kw) -> DataFrame:
    """Extract member CSVs (skipping empty members like the reference,
    zip_ingestor.py:71-77) and scan them as one DataFrame."""
    scratch = scratch_dir or tempfile.mkdtemp(prefix="zip_ingest_")
    os.makedirs(scratch, exist_ok=True)
    extracted: list[str] = []
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            if not member.lower().endswith(".csv") or member.endswith("/"):
                continue
            target = os.path.join(scratch, os.path.basename(member))
            with zf.open(member) as src, open(target, "wb") as dst:
                data = src.read()
                if not data.strip():
                    continue  # skip empty members
                dst.write(data)
            extracted.append(target)
    if not extracted:
        raise ValueError(f"no non-empty CSV members in {zip_path}")
    return spark.read.options(header=True, inferSchema=True, **kw).csv(extracted)


def filter_channels(df, channels_path: str, channel_col: str = "repo"):
    """Keep only rows whose channel/vendor appears in a channels list file —
    the reference's channels-config scan (``telegram_scraper.py:162-177``:
    txt/csv of usernames, blanks skipped). Driver-side small read + isin
    filter (broadcast-friendly)."""
    with open(channels_path, encoding="utf-8") as f:
        channels = [ln.strip().lstrip("@") for ln in f if ln.strip()]
    from pyspark.sql import functions as F

    return df.where(F.col(channel_col).isin(channels))


def coerce_message_schema(df):
    """The reference's defensive per-column coercions on CSV re-read
    (``run_pipeline.py:91-99, 221-234``) as declarative expressions:
    message_text→string ''-filled, views→long null→0, message_date→timestamp
    (null on unparseable), drop rows without message_id."""
    from pyspark.sql import functions as F

    out = df
    if "content" in df.columns:
        out = out.withColumn("content", F.coalesce(F.col("content").cast("string"), F.lit("")))
    if "views" in df.columns:
        out = out.withColumn("views", F.coalesce(F.col("views").cast("long"), F.lit(0)))
    if "message_date" in df.columns:
        out = out.withColumn("message_date", F.col("message_date").try_cast("timestamp"))
    if "message_id" in df.columns:
        out = out.na.drop(subset=["message_id"])
    return out


def append_sink(df, path: str, fmt: str = "parquet") -> None:
    """Append-mode sink (reference S3 header-once CSV append semantics are
    moot for parquet — append is a new file in the directory)."""
    df.write.mode("append").format(fmt).save(path)
