"""JVM expression extractor vs the Python kernel: token-for-token and
entity-for-entity equality over the synthetic corpus + adversarial cases."""

import pytest
from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.data.synthetic import generate_messages_pandas
from amharic_ecommerce_data_extractor_spark.functions import extract_expr as xe
from amharic_ecommerce_data_extractor_spark.functions.textnorm import preprocess_expr
from amharic_ecommerce_data_extractor_spark.kernels import labeler as lb
from amharic_ecommerce_data_extractor_spark.kernels import textprep as tp

ADVERSARIAL = [
    "ምርጥ blender ዋጋ 500 ብር መገናኛ ሲቲ ሞል 0911223344",
    "550ብር ዋጋ፦1,200 ብር በ 250 ብር",
    "ዋጋ 500",
    "ዋጋ",
    "mini electric stove 2500 ብር +251911123456",
    "መገናኛ 4 ፎቅ ቢሮ ቁጥር 2",
    "10meter x 45cm tape",
    "axbxc 3x4",
    "ድስት ምጣድ መፍጫ",
    "hello world nothing here",
    "",
    "። ፣ ! ?",
    "ዋጋ ብር",          # trigger followed by non-number
    "500 600 ብር",       # only the second number is priced
    "ለቡ",               # single location token
    "quality",           # single product indicator
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    texts = (generate_messages_pandas(n_rows=500, n_vendors=15)["content"].tolist()
             + ADVERSARIAL)
    clean = [tp.preprocess_text(t) for t in texts]
    return (spark.createDataFrame([(i, c) for i, c in enumerate(clean)],
                                  "i long, clean string").cache(),
            clean)


def test_tokenizer_expr_matches_kernel(spark, corpus_df):
    df, clean = corpus_df
    got = [r["toks"] for r in
           df.select("i", xe.tokenize_message_expr(F.col("clean")).alias("toks"))
           .orderBy("i").collect()]
    want = [lb.tokenize_message(c) for c in clean]
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (clean[i], g, w)


def test_labeler_expr_matches_kernel(spark, corpus_df):
    df, clean = corpus_df
    toks = xe.tokenize_message_expr(F.col("clean"))
    got = [r["labs"] for r in
           df.select("i", xe.label_tokens_expr(toks).alias("labs")).orderBy("i").collect()]
    want = [[l for _, l in lb.label_tokens(lb.tokenize_message(c))] for c in clean]
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, (clean[i], lb.tokenize_message(clean[i]), g, w)


def test_entity_grouping_expr_matches_kernel(spark, corpus_df):
    df, clean = corpus_df
    sel = xe.with_entities_expr(df, clean_col="clean").orderBy("i").collect()
    for row, c in zip(sel, clean):
        want = lb.extract_message(c)
        for k in ("tokens", "labels", "products", "prices", "locations",
                  "contacts", "price_values"):
            assert list(row[k]) == want[k], (c, k, list(row[k]), want[k])


def test_price_parse_expr_matches_kernel(spark):
    phrases = ["ዋጋ 500 ብር", "550 ብር", "1,200 ብር", "birr 99", "500", "abc", "", "2.5 ብር"]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(phrases)], "i long, p string")
    got = [r["v"] for r in df.select("i", xe.parse_price_expr(F.col("p")).alias("v"))
           .orderBy("i").collect()]
    want = [lb.parse_price(p) for p in phrases]
    assert got == want


def test_expr_extractor_is_pure_jvm(spark):
    df = spark.range(5).select(F.lit("ምርጥ blender ዋጋ 500 ብር").alias("clean"))
    toks = xe.tokenize_message_expr(preprocess_expr(F.col("clean")))
    out = df.select(xe.label_tokens_expr(toks).alias("labs"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "Exchange" not in plan
