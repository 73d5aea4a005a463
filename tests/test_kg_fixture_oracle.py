"""Keeps the pinned KG oracle fixtures honest:

1. regeneration equality — the committed parquet fixtures equal what the
   independent pandas oracle computes today (catches a stale fixture after
   any kernel/extractor change);
2. Spark parity — the Spark queries (q32/q33/q34) reproduce the fixtures
   exactly, value-for-value (the local mirror of the driver's hash compare).
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from make_oracle_fixtures import FIXTURE_DIR, build_fixtures  # noqa: E402

from amharic_ecommerce_data_extractor_spark.queries import SPARK_QUERIES  # noqa: E402

KG_QUERIES = ["q32_kg_triples_profile", "q33_kg_vendor_scorecard", "q34_kg_entity_linking"]


@pytest.fixture(scope="module")
def fresh():
    return build_fixtures()


@pytest.mark.parametrize("name", KG_QUERIES)
def test_committed_fixture_is_current(fresh, name):
    committed = pd.read_parquet(os.path.join(FIXTURE_DIR, f"{name}.parquet"))
    expect = fresh[name]
    got = committed.sort_values(list(committed.columns)).reset_index(drop=True)
    want = expect.sort_values(list(expect.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


@pytest.mark.parametrize("name", KG_QUERIES)
def test_spark_matches_fixture(spark, sf_dir, fresh, name):
    sdf = SPARK_QUERIES[name](spark, sf_dir)
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in fresh[name].itertuples(index=False))
    assert sdf.columns == list(fresh[name].columns)
    assert got == want, f"{name}: first diffs {[p for p in zip(got, want) if p[0] != p[1]][:3]}"
