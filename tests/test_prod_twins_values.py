"""VALUE-verification of the production-hash twin queries against the
engine-independent Python oracle (tests/prod_oracle.py + tests/pyxxh64.py).

The md5-family registry queries are value-checked against DuckDB by
test_queries_oracle.py; these twins run xxhash64 / seeded-Gaussian planes —
the path a production user actually executes — and were previously only
execute-and-nonempty checked. Each test here recomputes the twin's full
result from the parquet input in plain Python (pure-Python XXH64, pinned
bit-exact vs Spark by test_xxh64_primitive.py) and compares values.

Averages of floating sums are compared at 1e-9 after the query's own
round(…, 6): Spark's avg() adds partition-ordered, the oracle adds
left-to-right — bit-identical inputs can differ in the last ulp of the SUM,
which is measurement noise, not a hash bug. Counts and hash-derived keys
are compared exactly.
"""

import pandas as pd
import pytest

import prod_oracle as po
from amharic_ecommerce_data_extractor_spark.queries import SPARK_QUERIES


@pytest.fixture(scope="module")
def docs_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_q29p_simhash_bucket_profile(spark, sf_dir, docs_pd):
    got = [(r["bucket"], r["n"]) for r in
           SPARK_QUERIES["q29p_simhash_bucket_profile_prod"](spark, sf_dir).collect()]
    assert got == po.q29p_expected(docs_pd)


def test_q41p_simhash_duplicate_groups(spark, sf_dir, docs_pd):
    r = SPARK_QUERIES["q41p_simhash_duplicate_groups_prod"](spark, sf_dir).collect()[0]
    assert (r["n_groups"], r["total_docs"], r["max_group"]) == \
        po.q41p_expected(docs_pd)


def test_q31p_minhash_near_dup_pairs(spark, sf_dir, docs_pd):
    r = SPARK_QUERIES["q31p_minhash_near_dup_pairs_prod"](spark, sf_dir).collect()[0]
    n, avg = po.q31p_expected(docs_pd)
    assert r["n_pairs"] == n
    assert abs(r["avg_jaccard"] - avg) <= 1e-9


def test_q42p_ngram_jaccard_pairs(spark, sf_dir, docs_pd):
    r = SPARK_QUERIES["q42p_ngram_jaccard_pairs_prod"](spark, sf_dir).collect()[0]
    n, avg = po.q42p_expected(docs_pd)
    assert r["n_pairs"] == n
    assert abs(r["avg_jaccard"] - avg) <= 1e-9


def test_q48p_winnowing_overlap_pairs(spark, sf_dir, docs_pd):
    r = SPARK_QUERIES["q48p_winnowing_overlap_pairs_prod"](spark, sf_dir).collect()[0]
    n, avg = po.q48p_expected(docs_pd)
    assert r["n_pairs"] == n
    assert abs(r["avg_shared"] - avg) <= 1e-9


def test_q40p_embedding_near_dup_pairs(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    r = SPARK_QUERIES["q40p_embedding_near_dup_pairs_prod"](spark, sf_dir).collect()[0]
    n, avg = po.q40p_expected(emb)
    assert r["n_pairs"] == n
    if avg is None:
        assert r["avg_sim"] is None
    else:
        assert abs(r["avg_sim"] - avg) <= 1e-9


def test_q37p_curation_audit(spark, sf_dir, docs_pd):
    got = [(r["stage_idx"], r["stage"], r["rows_surviving"]) for r in
           SPARK_QUERIES["q37p_curation_audit_prod"](spark, sf_dir)
           .orderBy("stage_idx").collect()]
    assert got == po.q37p_expected(docs_pd)


def test_embedding_near_dup_gauss_nonempty_threshold(spark, sf_dir):
    """q40p at its 0.9 threshold yields zero pairs at this sf — matching on
    empty proves little. Re-run the same production operator (gauss planes,
    seed-42 LSH path) at 0.2 where pairs DO exist (696 at sf0.001), against
    the same oracle parameterized identically."""
    import pandas as pd
    from pyspark.sql import functions as F

    from amharic_ecommerce_data_extractor_spark.operators.dedup import (
        embedding_duplicate_pairs,
    )

    emb_pd = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = (embedding_duplicate_pairs(emb, threshold=0.2)
           .agg(F.count("*").alias("n_pairs"),
                F.round(F.avg("sim"), 6).alias("avg_sim")).collect()[0])
    n, avg = po.q40p_expected(emb_pd, threshold=0.2)
    assert n > 0, "fixture produced no pairs even at 0.2 — raise threshold"
    assert got["n_pairs"] == n
    assert abs(got["avg_sim"] - avg) <= 1e-9
