"""The JVM expression chain must equal the Python kernel on NFC input —
compared over the full synthetic corpus plus adversarial literals."""

import pandas as pd
from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.data.synthetic import generate_messages_pandas
from amharic_ecommerce_data_extractor_spark.functions.textnorm import (
    preprocess_expr,
    tokenize_expr,
)
from amharic_ecommerce_data_extractor_spark.kernels import textprep as tp

ADVERSARIAL = [
    "ሃሎ ኋይት ሧት ፅናት ጽ ሓ",
    "ዋጋው ፻፳፭ ብር ነው። ፰፻",
    "x!!!...??  ,,ab፦cd፡ef",
    "https://t.me/a @ማርያም #ቅናሽ_1 www.x.io ስም",
    "emoji 😊🚀 mixed ຣ ไทย",
    "  spaced\tout text  ",
    "500ብር እና ብር500 12a34b",
    "", "   ", None,
]


def test_expr_equals_kernel(spark):
    texts = generate_messages_pandas(n_rows=400, n_vendors=10)["content"].tolist() + ADVERSARIAL
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, content string")
    got = (df.select("i", preprocess_expr(F.col("content")).alias("clean"))
           .withColumn("tokens", tokenize_expr(F.col("clean")))
           .orderBy("i").collect())
    want_clean = tp.preprocess_series(pd.Series(texts, dtype=object)).tolist()
    want_tokens = [tp.tokenize_text(c) for c in want_clean]
    for row, wc, wt in zip(got, want_clean, want_tokens):
        assert row["clean"] == wc, (texts[row["i"]], row["clean"], wc)
        assert row["tokens"] == wt, (texts[row["i"]], row["tokens"], wt)


def test_expr_plan_is_codegen_only(spark):
    # the whole chain must be a single narrow projection — no shuffle, no
    # Python evaluation anywhere in the plan
    df = spark.range(10).select(F.concat(F.lit("ዋጋ ፻ ብር "), F.col("id").cast("string")).alias("content"))
    plan = (df.select(preprocess_expr(F.col("content")).alias("c"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
