"""Triple emission (graft operator G1 — no reference counterpart; mandated by
the north rule).

Per-message entity record → ``(subj, pred, obj, message_id, confidence)``
rows with four predicates:

    (vendor,  sells,      product)   one per distinct product in the message
    (product, priced_at,  price)     k-th price value paired with the k-th
                                     product; surplus prices clamp to the last
                                     product (deterministic positional rule —
                                     the reference never pairs them at all)
    (vendor,  located_in, location)  one per distinct location
    (vendor,  contact,    phone)     one per distinct contact token

All pure JVM higher-order array functions + one union: no Python, no shuffle
(explodes preserve partitioning). Dedup within a message via array_distinct —
mirrors the reference's per-message ``set()`` semantics
(``vendor_scorecard.py:54-57``) but with deterministic order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_COLUMNS = ["subj", "pred", "obj", "message_id", "confidence"]


def emit_triples(extracted: DataFrame, vendor_col: str = "repo") -> DataFrame:
    v = F.col(vendor_col)

    sells = (
        extracted.select(v.alias("subj"),
                         F.explode(F.array_distinct("products")).alias("obj"),
                         "message_id")
        .withColumn("pred", F.lit("sells"))
    )

    located = (
        extracted.select(v.alias("subj"),
                         F.explode(F.array_distinct("locations")).alias("obj"),
                         "message_id")
        .withColumn("pred", F.lit("located_in"))
    )

    contact = (
        extracted.select(v.alias("subj"),
                         F.explode(F.array_distinct("contacts")).alias("obj"),
                         "message_id")
        .withColumn("pred", F.lit("contact"))
    )

    # positional product↔price pairing, clamped to the last product
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("price_values") - 1),
        lambda i: F.struct(
            F.try_element_at(F.col("products"), F.least(i + 1, F.size("products"))).alias("subj"),
            F.try_element_at(F.col("price_values"), i + 1).cast("string").alias("obj"),
        ),
    )
    priced = (
        extracted.where((F.size("products") > 0) & (F.size("price_values") > 0))
        .select(F.explode(F.array_distinct(pairs)).alias("p"), "message_id")
        .select(F.col("p.subj").alias("subj"), F.col("p.obj").alias("obj"), "message_id")
        .withColumn("pred", F.lit("priced_at"))
    )

    out = sells.unionByName(priced).unionByName(located).unionByName(contact)
    return out.select("subj", "pred", "obj", "message_id",
                      F.lit(1.0).alias("confidence"))
