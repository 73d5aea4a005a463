"""Deterministic synthetic Amharic e-commerce message corpus (seed=42).

Implements FIXTURES.md F1/F5: the raw message table of the reference scraper
(``telegram_scraper.py:153-156`` column set) mapped onto the graft input hint
``(repo, path, commit, lang, content)``, with companion ``message_id``,
``message_date``, ``views`` columns and the per-row ``content_sha256``
invariant.

Generation is *distributed and parallelism-invariant*: every row is derived
solely from its row id via a per-row ``random.Random(seed ^ id)``, produced by
``mapInPandas`` over ``spark.range(n)`` — the same corpus comes out at
local[1] and local[32], at any partition count, with no driver-side
materialization. This is the property that lets the same generator synthesize
benchmark corpora of any size.

Message templates are composed from the reference's own gazetteers
(``pseudo_labeler.py:92,122,125``) so the rule extractor has known ground
truth, plus noise exercising every normalization step (URLs, mentions,
hashtags, emoji, Geez numerals, Ethiopian punctuation, glyph variants).
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..kernels import labeler as lb

SEED = 42
_EPOCH = pd.Timestamp("2024-01-01 00:00:00")

MESSAGE_SCHEMA = T.StructType([
    T.StructField("message_id", T.LongType(), False),
    T.StructField("repo", T.StringType(), False),           # ≙ channel_username (vendor)
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), True),          # ≙ message_text
    T.StructField("message_date", T.TimestampType(), True),
    T.StructField("views", T.LongType(), True),
    T.StructField("channel_title", T.StringType(), True),
    T.StructField("sender_id", T.LongType(), True),
    T.StructField("sender_username", T.StringType(), True),
    T.StructField("media_path", T.StringType(), True),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("content_sha256", T.StringType(), True),
])

_PRODUCTS_EN = sorted(lb.ENGLISH_PRODUCT_INDICATORS)[:40]
_PRODUCTS_AM = sorted(lb.AMHARIC_PRODUCT_INDICATORS)
_DESCRIPTORS = sorted(lb.PRODUCT_DESCRIPTORS)[:20]
_LOCATIONS = ["መገናኛ", "ለቡ", "ሲቲ ሞል", "መገናኛ ሲቲ ሞል", "ህንፃ 2 ፎቅ", "ቢሮ ቁጥር 4"]
_GREETINGS = ["ሰላም ውድ ደንበኞቻችን", "እንኳን ደህና መጡ", "አዲስ እቃ ገብቷል", "ልዩ ቅናሽ", ""]
_NOISE = ["https://t.me/shop{v}", "@shop{v}", "#ቅናሽ", "😍🔥", "፳፭% ቅናሽ", "ሃሎ!!", "ዋጋው።።ርካሽ"]
_MEDIA_TYPES = ["", "photo_skipped_download", "document_skipped_download"]
_LANGS = ["am"] * 9 + ["en"]


def _vendor_of(rng: random.Random, n_vendors: int) -> int:
    # zipf-ish skew: vendor 0 is the mega-vendor with ~50% of all rows
    if rng.random() < 0.5:
        return 0
    return rng.randint(1, max(1, n_vendors - 1))


def _compose_content(rng: random.Random, vendor: int) -> str:
    parts: list[str] = []
    g = rng.choice(_GREETINGS)
    if g:
        parts.append(g)
    # product phrase (80%)
    if rng.random() < 0.8:
        if rng.random() < 0.5:
            prod = rng.choice(_PRODUCTS_AM)
        else:
            prod = rng.choice(_PRODUCTS_EN)
            if rng.random() < 0.5:
                prod = f"{rng.choice(_DESCRIPTORS)} {prod}"
        parts.append(prod)
    # price form (70%)
    if rng.random() < 0.7:
        amount = rng.choice([250, 500, 550, 750, 1200, 1500, 2500, 5000])
        amt = f"{amount:,}" if rng.random() < 0.3 else str(amount)
        form = rng.choice(["ዋጋ {a} ብር", "{a}ብር", "ዋጋ፦{a} ብር", "በ {a} ብር"])
        parts.append(form.format(a=amt))
    # location (50%)
    if rng.random() < 0.5:
        parts.append("አድራሻ " + rng.choice(_LOCATIONS))
    # contact (40%)
    if rng.random() < 0.4:
        phone = rng.choice([f"09{rng.randint(0, 99999999):08d}",
                            f"+2519{rng.randint(0, 99999999):08d}"])
        parts.append("ስልክ " + phone)
    # noise (30%)
    if rng.random() < 0.3:
        parts.append(rng.choice(_NOISE).format(v=vendor))
    return " ".join(parts)


def _edge_content(message_id: int) -> str | None:
    # fixed edge rows exercising degenerate branches (FIXTURES.md F1)
    return {
        0: "",
        1: "   ",
        2: None,
        3: "ዋጋው ፻፳፭ ብር ነው። https://t.me/x @user #tag 😊 ሃሎ ኋይት",
        4: "ምጣድ ዋጋ 500 ብር መገናኛ 0911111111",           # single-post vendor (edge_v1)
        5: "blender ዋጋ 750 ብር",                            # tied max-views pair …
        6: "stove ዋጋ 750 ብር ለቡ",                           # … same vendor, same views
    }.get(message_id)


def _rows_for_ids(ids: pd.Series, n_vendors: int, seed: int) -> pd.DataFrame:
    recs = []
    for mid in ids:
        mid = int(mid)
        rng = random.Random((seed << 32) ^ mid)
        edge = _edge_content(mid)
        if mid == 4:
            vendor_name, vendor_num = "edge_single_post", 998
        elif mid in (5, 6):
            vendor_name, vendor_num = "edge_tied_views", 999
        else:
            vendor_num = _vendor_of(rng, n_vendors)
            vendor_name = f"vendor_{vendor_num:03d}"
        content = edge if mid <= 6 else _compose_content(rng, vendor_num)
        # per-vendor posting cadence over a 90-day window
        ts = _EPOCH + pd.Timedelta(minutes=rng.randint(0, 90 * 24 * 60))
        views = None if rng.random() < 0.02 else int(rng.lognormvariate(5.0, 1.0))
        if mid in (5, 6):
            views = 777  # idxmax tie within edge_tied_views
        sha = hashlib.sha256((content or "").encode("utf-8")).hexdigest()
        recs.append({
            "message_id": mid,
            "repo": vendor_name,
            "path": f"msgs/{mid:012d}.txt",
            "commit": f"{(mid * 2654435761) & 0xFFFFFFFF:08x}",
            "lang": rng.choice(_LANGS),
            "content": content,
            "message_date": ts,
            "views": views,
            "channel_title": vendor_name.replace("_", " ").title(),
            "sender_id": 1000 + (mid % 97),
            "sender_username": f"sender_{mid % 97}",
            "media_path": "",
            "media_type": rng.choice(_MEDIA_TYPES),
            "content_sha256": sha,
        })
    return pd.DataFrame(recs, columns=[f.name for f in MESSAGE_SCHEMA.fields])


def generate_messages(
    spark: SparkSession,
    n_rows: int = 2000,
    n_vendors: int = 20,
    seed: int = SEED,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: same rows at any parallelism."""
    base = spark.range(0, n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _rows_for_ids(pdf["id"], n_vendors, seed)

    return base.mapInPandas(gen, schema=MESSAGE_SCHEMA)


def generate_messages_pandas(n_rows: int = 2000, n_vendors: int = 20, seed: int = SEED) -> pd.DataFrame:
    """Driver-side twin of generate_messages (same rows) for the pandas
    parity oracle in tests."""
    return _rows_for_ids(pd.Series(range(n_rows)), n_vendors, seed)
