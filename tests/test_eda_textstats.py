"""EDA library + text-analysis column functions."""

from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.functions import textstats as ts
from amharic_ecommerce_data_extractor_spark.operators import eda


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_eda_functions(spark, sf_dir):
    d = _docs(spark, sf_dir)
    assert eda.distinct_count(d, "lang") == 5
    vc = eda.value_counts(d, "lang").collect()
    assert sum(r["count"] for r in vc) == d.count()
    assert vc == sorted(vc, key=lambda r: (-r["count"], r["lang"]))
    mp = eda.missing_profile(d).collect()[0]
    assert mp["text_nulls"] == 0
    assert eda.vocabulary_size(d, "text") > 10
    tw = eda.top_words(d, "text", k=5).collect()
    assert len(tw) == 5 and tw[0]["n"] >= tw[-1]["n"]
    ls = eda.length_stats(d, "text", by="lang").collect()
    assert all(r["avg_len"] > 0 for r in ls)
    ec = eda.empty_output_counts(d, "text", by="lang").collect()
    assert all(r["n_empty"] == 0 for r in ec)


def test_eda_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dc = eda.daily_counts(ev, "ts").collect()
    assert sum(r["n"] for r in dc) == ev.count()
    dow = eda.dow_histogram(ev, "ts").collect()
    assert 1 <= len(dow) <= 7
    cm = eda.correlation_matrix(ev, ["value", "user_id"]).collect()[0]
    assert abs(cm["corr_value__user_id"]) <= 1.0


def test_detect_script(spark):
    df = spark.createDataFrame(
        [(1, "ሰላም ውድ ደንበኞቻችን እንኳን ደህና መጡ"),
         (2, "hello plain english text here"),
         (3, "你好 世界 你好 世界 你好"),
         (4, "Привет мир как дела сегодня"),
         (5, "مرحبا بالعالم كيف حالك"),
         (6, "12345 67890 !!!")],
        "id long, t string")
    got = {r["id"]: r["s"] for r in df.select("id", ts.detect_script(F.col("t")).alias("s")).collect()}
    assert got == {1: "am", 2: "latin", 3: "cjk", 4: "cyrillic", 5: "arabic", 6: "other"}


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "hello world, this is fine and long enough to pass the gate"),
         (2, "spam spam spam spam spam spam"),
         (3, "!!!! ???? ....")],
        "id long, t string")
    rows = {r["id"]: r for r in df.select(
        "id",
        ts.whitespace_token_count(F.col("t")).alias("ws"),
        ts.bpe_ish_token_count(F.col("t")).alias("bpe"),
        ts.quality_score(F.col("t")).alias("q"),
        ts.content_fingerprint(F.col("t")).alias("fp"),
    ).collect()}
    assert rows[1]["ws"] == 12
    assert rows[1]["bpe"] == 13  # 12 words + 1 comma
    assert rows[1]["q"] > rows[2]["q"] > rows[3]["q"]
    assert isinstance(rows[1]["fp"], int)
    # fingerprint is whitespace/case insensitive
    df2 = spark.createDataFrame([(1, "  HELLO   world, this is fine and long enough to pass the gate ")],
                                "id long, t string")
    fp2 = df2.select(ts.content_fingerprint(F.col("t")).alias("fp")).collect()[0]["fp"]
    assert fp2 == rows[1]["fp"]


def test_stopword_ratio(spark):
    df = spark.createDataFrame([(1, "the cat and the dog")], "id long, t string")
    r = df.select(ts.stopword_ratio(F.col("t"), ["the", "and"]).alias("r")).collect()[0]["r"]
    assert abs(r - 3 / 5) < 1e-9


def test_with_has_media(spark):
    from amharic_ecommerce_data_extractor_spark.operators.eda import with_has_media

    df = spark.createDataFrame(
        [("", ""), ("", "photo_skipped_download"), ("x.jpg", ""), (None, None)],
        "media_path string, media_type string")
    got = [r["has_media"] for r in with_has_media(df).collect()]
    assert got == [False, True, True, False]


def test_quality_twin_matches_beyond_ascii(spark):
    """The DuckDB quality/token twins must agree with the Spark expressions
    on Amharic, empty and whitespace-only documents — not only on the ASCII
    sf corpora (round-2 review finding: the old twins used ASCII-only RE2
    classes and unfiltered token splits)."""
    import duckdb

    from amharic_ecommerce_data_extractor_spark.functions import textstats as ts
    from amharic_ecommerce_data_extractor_spark.queries import (
        _QUALITY_SQL,
        _WS_TOKENS_SQL,
    )

    texts = [
        "ሰላም ውድ ደንበኞቻችን ዋጋ 500 ብር በመገናኛ ይገኛል።",
        "mixed ጫማ shoes 1,200 birr!!! ***",
        "",
        "   ",
        "plain ascii words repeated words repeated",
        "ቦሌ መድሃኔዓለም ሞል ሁለተኛ ፎቅ ስልክ 0911234567",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: (r["q"], r["n"]) for r in df.select(
        "doc_id", ts.quality_score(F.col("text")).alias("q"),
        ts.whitespace_token_count(F.col("text")).alias("n")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        f"SELECT doc_id, {_QUALITY_SQL} AS q, {_WS_TOKENS_SQL} AS n FROM documents").fetchall()}

    for i in range(len(texts)):
        assert got[i][1] == want[i][1], (i, texts[i], got[i], want[i])
        assert abs(got[i][0] - want[i][0]) < 1e-9, (i, texts[i], got[i], want[i])
