"""Vendor features computed over the canonical knowledge graph (north-star:
scorecard features as window aggregations over the canonical graph).

Input: the canonicalized triple table (subj, pred, obj, message_id,
confidence). Outputs one row per vendor with graph-shape features:

* catalog breadth   — distinct canonical products sold
* geo presence      — distinct canonical locations
* contactability    — distinct contact points
* price positioning — median/avg of the vendor's products' canonical prices
* product_rank      — dense rank of vendors by catalog breadth (window)
* share_of_market   — vendor's product mentions / all product mentions
                      (window over the whole table — tiny: one row per vendor)

All aggregations are algebraic or exact-percentile over per-vendor groups;
the windows run over the vendor-level table (|vendors| rows), never over
message-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def vendor_graph_features(canon_triples: DataFrame) -> DataFrame:
    t = canon_triples
    sells = t.where(F.col("pred") == "sells")
    located = t.where(F.col("pred") == "located_in")
    contact = t.where(F.col("pred") == "contact")
    priced = t.where(F.col("pred") == "priced_at")

    per_vendor = sells.groupBy(F.col("subj").alias("vendor")).agg(
        F.countDistinct("obj").alias("n_products"),
        F.count("*").alias("n_product_mentions"),
    )
    geo = located.groupBy(F.col("subj").alias("vendor")).agg(
        F.countDistinct("obj").alias("n_locations"))
    con = contact.groupBy(F.col("subj").alias("vendor")).agg(
        F.countDistinct("obj").alias("n_contacts"))

    # product → price stats, joined back through the vendor's sells edges
    prod_price = priced.groupBy(F.col("subj").alias("product")).agg(
        F.round(F.avg(F.col("obj").try_cast("double")), 6).alias("avg_product_price"))
    vendor_price = (
        sells.select(F.col("subj").alias("vendor"), F.col("obj").alias("product"))
        .dropDuplicates(["vendor", "product"])
        .join(prod_price, "product", "left")
        .groupBy("vendor")
        .agg(F.round(F.avg("avg_product_price"), 6).alias("avg_price"),
             F.round(F.expr("percentile(avg_product_price, 0.5)"), 6).alias("median_price"))
    )

    feats = (per_vendor
             .join(geo, "vendor", "left")
             .join(con, "vendor", "left")
             .join(vendor_price, "vendor", "left")
             .na.fill({"n_locations": 0, "n_contacts": 0}))

    w_rank = Window.orderBy(F.desc("n_products"), F.asc("vendor"))
    w_all = Window.partitionBy()
    return feats.select(
        "vendor", "n_products", "n_product_mentions", "n_locations", "n_contacts",
        "avg_price", "median_price",
        F.dense_rank().over(w_rank).alias("product_rank"),
        F.round(F.col("n_product_mentions") / F.sum("n_product_mentions").over(w_all), 6)
         .alias("share_of_mentions"),
    )
