"""Similarity search over embedding columns (graft-added capability).

* ``knn_bruteforce`` — exact cosine top-k: broadcast the (small) query set
  against the corpus, dot products as JVM higher-order functions
  (``zip_with`` + ``aggregate``, no Python), rank with a per-query window.
  This is the correctness baseline; cost O(|Q|·|corpus|) — fine when |Q| is
  small and broadcast-able.
* ``knn_lsh`` — the scale path: random-hyperplane (SimHash) bucketing; only
  candidates sharing a band bucket are scored, turning the cross join into an
  equi join on (band, signature). Probabilistic recall, tunable via
  n_planes/n_bands; falls back to exact scoring inside each bucket.

All arithmetic in float64 on the JVM side for cross-engine comparability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _norm(col):
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x.cast("double") * x.cast("double")),
                              F.lit(0.0), lambda a, x: a + x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. queries must be small (is broadcast)."""
    # norms are computed once per row BEFORE the join (O(n+q) not O(n·q))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
                       _norm(F.col(vec_col)).alias("q_norm"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
                      _norm(F.col(vec_col)).alias("c_norm"))
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (_dot(F.col("q_vec"), F.col("c_vec"))
                 / (F.col("q_norm") * F.col("c_norm"))).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "sim", "rnk"))


def simhash_signature(vec_col, planes: list[list[float]]):
    """Sign pattern of the vector against fixed random hyperplanes, as a
    bit-string per band. planes: n_planes x dim (broadcast as literals)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(p) for p in plane]),
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda a, x: a + x,
            ) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def _planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bands: int = 8,
    bits_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: SimHash band bucketing → equi-join on
    (band, signature) → exact cosine inside buckets → per-query top-k.
    At 100TB this replaces the cross join with a shuffle on bucket keys;
    skewed buckets are split by AQE."""
    planes = _planes(n_bands * bits_per_band, dim, seed)

    def with_bands(df: DataFrame, idn: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(idn), F.col(vec_col).alias(f"{idn}_vec"))
        bands = []
        for b in range(n_bands):
            sig = simhash_signature(F.col(f"{idn}_vec"),
                                    planes[b * bits_per_band:(b + 1) * bits_per_band])
            bands.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
        return out.withColumn("bands", F.array(*bands)).select(
            idn, f"{idn}_vec", F.explode("bands").alias("bk")
        ).select(idn, f"{idn}_vec", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))

    qb = with_bands(queries, "query_id")
    cb = with_bands(corpus, "neighbor_id")
    cand = (
        qb.join(cb, on=["band", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_vec", "neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        cosine_expr(F.col("query_id_vec"), F.col("neighbor_id_vec")).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "sim", "rnk"))
