"""Distributed NER evaluation metrics (reference M5 — seqeval semantics,
``ner_trainer.py:26-65`` — rebuilt as aggregations instead of a driver loop).

* token_confusion: (true_label, predicted_label, n) counts via one groupBy.
* span_prf: entity-level precision/recall/F1 per entity type — spans are
  (sid, type, start, end) sets from BIO arrays; P/R from an inner join of
  predicted vs gold span sets (exact-match criterion, like seqeval default).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_SPAN_SCHEMA = T.StructType([
    T.StructField("sid", T.LongType(), False),
    T.StructField("etype", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
])


KNOWN_TYPES = frozenset({"PRODUCT", "PRICE", "LOC", "CONTACT_INFO"})


def _bio_spans(labels: list[str]) -> list[tuple[str, int, int]]:
    """BIO array → [(type, start, end_exclusive)]; labels outside the known
    type set (e.g. the corpus's corrupted ``I-LOCገ``) count as O; I- continues
    only a same-type run (seqeval start-of-span rules)."""
    spans = []
    cur_type, cur_start = None, -1
    for i, lab in enumerate(labels or []):
        if isinstance(lab, str) and lab.startswith(("B-", "I-")) and lab[2:] in KNOWN_TYPES:
            etype = lab[2:]
            if lab.startswith("B-") or etype != cur_type:
                if cur_type is not None:
                    spans.append((cur_type, cur_start, i))
                cur_type, cur_start = etype, i
        else:
            if cur_type is not None:
                spans.append((cur_type, cur_start, i))
            cur_type = None
    if cur_type is not None:
        spans.append((cur_type, cur_start, len(labels)))
    return spans


def spans_table(df: DataFrame, id_col: str, labels_col: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, labels in zip(pdf[id_col], pdf[labels_col]):
                for etype, s, e in _bio_spans(list(labels) if labels is not None else []):
                    rows.append((int(sid), etype, s, e))
            yield pd.DataFrame(rows, columns=["sid", "etype", "start", "end"])

    return df.select(F.col(id_col), F.col(labels_col)).mapInPandas(run, schema=_SPAN_SCHEMA)


def token_confusion(pred: DataFrame, gold: DataFrame,
                    keys=("sid", "pos")) -> DataFrame:
    """pred/gold: (sid, pos, label) token rows → confusion counts."""
    p = pred.select(*keys, F.col("label").alias("predicted"))
    g = gold.select(*keys, F.col("label").alias("true"))
    return (g.join(p, on=list(keys), how="full")
            .select(F.coalesce("true", F.lit("O")).alias("true"),
                    F.coalesce("predicted", F.lit("O")).alias("predicted"))
            .groupBy("true", "predicted").agg(F.count("*").alias("n")))


def span_prf(pred_spans: DataFrame, gold_spans: DataFrame) -> DataFrame:
    """Per-type + macro precision/recall/F1 on exact span match."""
    hit = pred_spans.join(gold_spans, on=["sid", "etype", "start", "end"]) \
        .groupBy("etype").agg(F.count("*").alias("tp"))
    np_ = pred_spans.groupBy("etype").agg(F.count("*").alias("n_pred"))
    ng = gold_spans.groupBy("etype").agg(F.count("*").alias("n_gold"))
    per = (ng.join(np_, "etype", "full").join(hit, "etype", "left")
           .select("etype",
                   F.coalesce("tp", F.lit(0)).alias("tp"),
                   F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
                   F.coalesce("n_gold", F.lit(0)).alias("n_gold")))
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(F.lit(0.0))
    per = per.select("etype", F.round(prec, 6).alias("precision"),
                     F.round(rec, 6).alias("recall"), "tp", "n_pred", "n_gold")
    f1 = F.when((F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall"))).otherwise(F.lit(0.0))
    return per.withColumn("f1", F.round(f1, 6))
