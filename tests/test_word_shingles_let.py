"""Focused pin for the let-bound word_shingles rewrite (operators/dedup):
the words array is bound once through a single-element outer transform
instead of re-evaluating the lower/trim/split chain per element lookup.
Output must stay byte-identical to the pure-Python reference
(tests/prod_oracle.word_shingles_py) on real rows and edge shapes."""

from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.operators.dedup import word_shingles
from tests.prod_oracle import word_shingles_py

EDGES = [
    "",              # empty → [''] (whole-text single shingle)
    "   ",           # whitespace-only
    "one",           # fewer words than n
    "one two",       # n-1 words
    "one two three",  # exactly n words
    "a  b\t c\nd e",  # mixed whitespace runs
    "ሀሁ ሂ ሃ ሄ ህ",   # Amharic tokens
    "Mixed CASE Words here",  # lowering matters
    "dup dup dup dup",        # array_distinct collapse
]


def test_word_shingles_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(300)
    edge = spark.createDataFrame(
        [(90_000 + i, t) for i, t in enumerate(EDGES)], "doc_id long, text string")
    df = docs.union(edge)
    for n in (2, 3):
        got = {r["doc_id"]: r["sh"] for r in
               df.select("doc_id", word_shingles(F.col("text"), n).alias("sh"))
               .collect()}
        want = {r["doc_id"]: word_shingles_py(r["text"], n)
                for r in df.collect()}
        assert got == want
