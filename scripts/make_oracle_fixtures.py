#!/usr/bin/env python
"""Generate the pinned oracle fixtures for the synthetic-corpus KG queries
(q32 triples profile, q33 vendor scorecard, q34 entity-linking counts).

The fixtures are computed by the INDEPENDENT pandas oracle
(kernels/pandas_oracle.py — reference notebook-03 semantics, hashlib-based
MinHash twin, union-find components) over the same deterministic seed-pinned
synthetic corpus the Spark queries consume, then written as parquet that the
driver's DuckDB oracle reads back via read_parquet(). Regenerate with:

    python scripts/make_oracle_fixtures.py

tests/test_kg_fixture_oracle.py asserts both that the committed fixtures are
current (regeneration equality) and that the Spark queries reproduce them.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures", "oracle")

SCHEMAS = {
    "q32_kg_triples_profile": pa.schema([
        ("pred", pa.string()), ("n_triples", pa.int64()),
        ("n_subjects", pa.int64()), ("n_objects", pa.int64())]),
    "q33_kg_vendor_scorecard": pa.schema([
        ("vendor", pa.string()), ("total_posts", pa.int64()),
        ("avg_views_per_post", pa.float64()), ("posts_per_week", pa.float64()),
        ("lending_score_0_100", pa.float64())]),
    "q34_kg_entity_linking": pa.schema([
        ("type", pa.string()), ("n_surfaces", pa.int64()),
        ("n_canonical", pa.int64())]),
}


def build_fixtures() -> dict:
    """Returns {query_name: pandas.DataFrame} — the independent expected
    results for the synthetic corpus at n_rows=2000, n_vendors=20."""
    from amharic_ecommerce_data_extractor_spark.data.synthetic import (
        generate_messages_pandas,
    )
    from amharic_ecommerce_data_extractor_spark.kernels import pandas_oracle as po

    msgs = generate_messages_pandas(n_rows=2000, n_vendors=20)
    extracted = po.extract_frame(msgs)
    return {
        "q32_kg_triples_profile": po.triples_profile(po.emit_triples(extracted)),
        "q33_kg_vendor_scorecard": po.scorecard_view(po.vendor_scorecard(extracted)),
        "q34_kg_entity_linking": po.canonicalize_counts(po.entity_surfaces(extracted)),
    }


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, pdf in build_fixtures().items():
        path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        table = pa.Table.from_pandas(pdf, schema=SCHEMAS[name], preserve_index=False)
        pq.write_table(table, path)
        print(f"wrote {path} ({len(pdf)} rows)")


if __name__ == "__main__":
    main()
