"""Pinned pandas oracle: the reference's *working* end-to-end semantics
(notebook 03 cells 7→25 — the src scorecard module crashes, SURVEY.md
Appendix A) reimplemented as a small eager pandas program.

This is the parity target for the Spark pipeline: tests assert triple-set
P/R ≥ 0.95 (they are in fact exactly equal) and scorecard value equality.
Single-process by design — it exists to be obviously-correct, not fast.
"""

from __future__ import annotations

import pandas as pd

from . import labeler as lb
from . import textprep as tp


def extract_frame(messages: pd.DataFrame, text_col: str = "content") -> pd.DataFrame:
    df = messages.copy()
    clean = tp.preprocess_series(df[text_col])
    recs = [lb.extract_message(c) for c in clean]
    df["preprocessed_text"] = clean
    for f in ("tokens", "labels", "products", "prices", "locations", "contacts", "price_values"):
        df[f] = [r[f] for r in recs]
    return df


def emit_triples(extracted: pd.DataFrame, vendor_col: str = "repo") -> pd.DataFrame:
    rows: list[tuple] = []
    for _, r in extracted.iterrows():
        mid, vendor = r["message_id"], r[vendor_col]
        prods = list(dict.fromkeys(r["products"]))
        for p in prods:
            rows.append((vendor, "sells", p, mid, 1.0))
        if r["products"] and r["price_values"]:
            seen = set()
            for i, pv in enumerate(r["price_values"]):
                subj = r["products"][min(i, len(r["products"]) - 1)]
                key = (subj, str(float(pv)))
                if key not in seen:
                    seen.add(key)
                    rows.append((subj, "priced_at", str(float(pv)), mid, 1.0))
        for loc in dict.fromkeys(r["locations"]):
            rows.append((vendor, "located_in", loc, mid, 1.0))
        for c in dict.fromkeys(r["contacts"]):
            rows.append((vendor, "contact", c, mid, 1.0))
    return pd.DataFrame(rows, columns=["subj", "pred", "obj", "message_id", "confidence"])


def vendor_scorecard(extracted: pd.DataFrame, vendor_col: str = "repo") -> pd.DataFrame:
    df = extracted.copy()
    df["views"] = df["views"].fillna(0).astype("int64")
    recs = []
    for vendor, g in df.groupby(vendor_col, sort=True):
        g = g.sort_values("message_id")
        total = len(g)
        avg_views = g["views"].mean() if not g["views"].dropna().empty else 0
        rng_days = (g["message_date"].max() - g["message_date"].min()).days + 1
        ppw = float(total) if rng_days <= 0 else total / (rng_days / 7)
        flat = [p for sub in g["price_values"] for p in sub]
        avg_price = sum(flat) / len(flat) if flat else None
        top = g.loc[g["views"].idxmax()]
        recs.append({
            "vendor": vendor,
            "total_posts": total,
            "avg_views_per_post": float(avg_views),
            "posts_per_week": ppw,
            "avg_price_etb": avg_price,
            "top_product": top["products"][0] if top["products"] else "N/A",
            "top_product_price": top["price_values"][0] if top["price_values"] else None,
        })
    sc = pd.DataFrame(recs)
    weights = {"avg_views_per_post": 0.4, "posts_per_week": 0.4, "avg_price_filled": 0.2}
    sc["avg_price_filled"] = sc["avg_price_etb"].fillna(0.0)
    score = pd.Series(0.0, index=sc.index)
    for m, w in weights.items():
        lo, hi = sc[m].min(), sc[m].max()
        norm = pd.Series(0.0, index=sc.index) if hi == lo else (sc[m] - lo) / (hi - lo)
        score = score + norm * w
    sc["lending_score_0_100"] = score * 100.0
    return (
        sc.drop(columns=["avg_price_filled"])
        .sort_values(["lending_score_0_100", "vendor"], ascending=[False, True])
        .reset_index(drop=True)
    )


def precision_recall(got: set, want: set) -> tuple[float, float]:
    if not got and not want:
        return 1.0, 1.0
    tp_ = len(got & want)
    p = tp_ / len(got) if got else 0.0
    r = tp_ / len(want) if want else 0.0
    return p, r
