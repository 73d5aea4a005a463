"""EDA / profiling aggregate library — the reference's notebook-01 and
diagnostics operators (SURVEY.md A7-A17) as reusable DataFrame functions.

Reference locations cited per function; all are single grouped aggregations
(partial-aggregated map-side, skew-tolerant) or explode+top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def distinct_count(df: DataFrame, col: str) -> int:
    """A7 — nunique (telegram_scraper.py:195)."""
    return df.select(F.countDistinct(col)).collect()[0][0]


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A8 — value_counts desc (telegram_scraper.py:208)."""
    return (df.groupBy(col).agg(F.count("*").alias("count"))
            .orderBy(F.desc("count"), F.asc(col)))


def missing_profile(df: DataFrame, by: str | None = None) -> DataFrame:
    """A9 — per-column null counts, optionally per group
    (telegram_scraper.py:202,222)."""
    cols = [c for c in df.columns if c != by]
    aggs = [F.sum(F.col(c).isNull().cast("int")).alias(f"{c}_nulls") for c in cols]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)


def mean_by(df: DataFrame, key: str, value: str) -> DataFrame:
    """A10 — mean per group (telegram_scraper.py:230)."""
    return df.groupBy(key).agg(F.round(F.avg(value), 6).alias(f"avg_{value}"))


def daily_counts(df: DataFrame, ts_col: str) -> DataFrame:
    """A11 — calendar-day resample counts (notebook 01 cell 30)."""
    return (df.groupBy(F.to_date(ts_col).alias("day")).agg(F.count("*").alias("n"))
            .orderBy("day"))


_DOW_NAMES = ("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
              "Friday", "Saturday")


def dow_histogram(df: DataFrame, ts_col: str) -> DataFrame:
    """A12 — day-of-week histogram (notebook 01 cell 30).

    dayofweek() (1=Sunday..7=Saturday, pure date arithmetic) indexing a
    7-element name literal replaces date_format(ts,'EEEE'): identical output
    (English day names; null ts → null index → null name, matching
    date_format's null), but codegen integer arithmetic instead of one
    JVM DateTimeFormatter format call per row (measured ~3.5 µs/row —
    the whole cost of the sf1.0 histogram)."""
    name = F.element_at(F.array(*[F.lit(d) for d in _DOW_NAMES]),
                        F.dayofweek(ts_col))
    return df.groupBy(name.alias("dow")).agg(F.count("*").alias("n"))


def vocabulary_size(df: DataFrame, text_col: str) -> int:
    """A13 — distinct whitespace tokens (notebook 01 cell 25)."""
    return (df.select(F.explode(F.split(text_col, r"\s+")).alias("w"))
            .where(F.col("w") != "").select(F.countDistinct("w")).collect()[0][0])


def top_words(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """A14 — most_common(k) (notebook 01 cell 27)."""
    return (df.select(F.explode(F.split(text_col, r"\s+")).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("w")).limit(k))


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """A15 — pairwise Pearson correlations (notebook 01 cell 35)."""
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.round(F.corr(a, b), 6).alias(f"corr_{a}__{b}"))
    return df.agg(*aggs)


def length_stats(df: DataFrame, text_col: str, by: str | None = None) -> DataFrame:
    """A16 — char length / word count means (notebook 01 cells 21,23)."""
    length = F.length(text_col)
    words = F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""))
    aggs = [F.round(F.avg(length), 6).alias("avg_len"),
            F.round(F.avg(words), 6).alias("avg_words"),
            F.count("*").alias("n")]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)


def empty_output_counts(df: DataFrame, text_col: str, by: str) -> DataFrame:
    """A17 — empty-after-processing counters per group
    (text_preprocessor.py:539-540)."""
    return df.groupBy(by).agg(
        F.sum(F.when(F.length(F.trim(F.col(text_col))) == 0, 1).otherwise(0)).alias("n_empty"),
        F.count("*").alias("n"))


def with_has_media(df: DataFrame, media_path_col: str = "media_path",
                   media_type_col: str = "media_type") -> DataFrame:
    """P7 — has_media flag (reference notebook 01 cell 33:
    ``media_path.notna()``). The reference scraper always writes
    ``media_path=''`` (downloads skipped, telegram_scraper.py:84-99), under
    which notna() is vacuously true — so the practical derivation treats ''
    as no-media and OR-s in the media_type marker the scraper DOES record."""
    has = ((F.col(media_path_col).isNotNull() & (F.length(media_path_col) > 0))
           | (F.coalesce(F.col(media_type_col), F.lit("")) != ""))
    return df.withColumn("has_media", has)
