"""ANN: brute-force correctness, LSH and IVF recall on the clustered
embeddings table."""

import pytest
from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.operators.similarity import (
    ivf_train_centroids,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _recall(approx, exact):
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    return len(a & e) / len(e)


def test_bruteforce_self_consistency(spark, emb):
    queries = emb.where(F.col("vec_id") < 5)
    out = knn_bruteforce(queries, emb, k=3)
    rows = out.collect()
    assert len(rows) == 15
    assert all(-1.0 - 1e-9 <= r["sim"] <= 1.0 + 1e-9 for r in rows)
    # deterministic ranking
    again = knn_bruteforce(queries, emb, k=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_recall(spark, emb):
    queries = emb.where(F.col("vec_id") % 25 == 0)
    exact = knn_bruteforce(queries, emb, k=5)
    cent = ivf_train_centroids(emb, n_cells=8)
    approx = knn_ivf(queries, emb, cent, k=5, nprobe=4)
    assert _recall(approx, exact) >= 0.7
    # probing every cell = exact
    full = knn_ivf(queries, emb, cent, k=5, nprobe=8)
    assert _recall(full, exact) >= 0.99


def test_lsh_recall(spark, emb):
    queries = emb.where(F.col("vec_id") % 25 == 0)
    exact = knn_bruteforce(queries, emb, k=5)
    approx = knn_lsh(queries, emb, k=5, n_bands=24, bits_per_band=4)
    assert _recall(approx, exact) >= 0.55
