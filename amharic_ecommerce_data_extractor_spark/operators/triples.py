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

All pure JVM higher-order array functions + ONE explode: no Python, no
shuffle (the explode preserves partitioning), and — critically — ONE pass
over ``extracted``. The per-predicate triples are built as per-row struct
arrays and concatenated BEFORE the explode; the earlier four-way union
referenced ``extracted`` once per predicate, which re-executed the whole
upstream (including the Python extraction UDF) four times whenever the
input was not materialized (the fused q32/q47/entry paths — measured 4×
the Python cost at 2k messages). Dedup within a message via
array_distinct — mirrors the reference's per-message ``set()`` semantics
(``vendor_scorecard.py:54-57``) but with deterministic order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_COLUMNS = ["subj", "pred", "obj", "message_id", "confidence"]

_TRIPLE_STRUCT = "array<struct<subj:string,pred:string,obj:string>>"


def emit_triples(extracted: DataFrame, vendor_col: str = "repo") -> DataFrame:
    v = F.col(vendor_col)

    def tri(arr_col: str, pred: str):
        # coalesce: a null array must contribute zero triples for ITS
        # predicate only — inside concat a bare null would null the whole
        # row's triple array and silently drop the other predicates too
        arr = F.coalesce(F.col(arr_col), F.array().cast("array<string>"))
        return F.transform(
            F.array_distinct(arr),
            lambda o: F.struct(v.alias("subj"), F.lit(pred).alias("pred"),
                               o.alias("obj")))

    # positional product↔price pairing, clamped to the last product
    # (deterministic positional rule — the reference never pairs them at all)
    pairs = F.when(
        (F.size("products") > 0) & (F.size("price_values") > 0),
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size("price_values") - 1),
            lambda i: F.struct(
                F.try_element_at(F.col("products"),
                                 F.least(i + 1, F.size("products"))).alias("subj"),
                F.lit("priced_at").alias("pred"),
                F.try_element_at(F.col("price_values"), i + 1)
                .cast("string").alias("obj"),
            )))
    ).otherwise(F.array().cast(_TRIPLE_STRUCT))

    all_triples = F.concat(tri("products", "sells"), pairs,
                           tri("locations", "located_in"),
                           tri("contacts", "contact"))
    return (extracted.select(F.explode(all_triples).alias("t"), "message_id")
            .select(F.col("t.subj").alias("subj"), F.col("t.pred").alias("pred"),
                    F.col("t.obj").alias("obj"), "message_id",
                    F.lit(1.0).alias("confidence")))
