"""Pins tests/pyxxh64.py (the pure-Python XXH64 oracle) bit-for-bit against
Spark's `xxhash64` across every composition shape the production-hash twin
queries use: bare strings, (string, int-seed-index) chains — the MinHash
per-seed hash — and array<long> values — the LSH band key."""

import random

import pytest
from pyspark.sql import functions as F

from pyxxh64 import spark_xxhash64


FUZZ_STRINGS = (
    ["", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
     "the quick brown fox jumps over the lazy dog",
     "x" * 31, "x" * 32, "x" * 33, "y" * 100, "z" * 1000,
     "ልብስ በጣም ቆንጆ ነው", "ዋጋ 500 ብር", "አዲስ አበባ ቦሌ",
     "፲፱፻፷፮", "mixed ላቲን and ግዕዝ 42", " leading", "trailing ",
     "tab\tsep", "new\nline", "emoji 🛍️ test"]
    + ["w%d" % random.Random(7).randrange(10**6) for _ in range(40)]
)


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in FUZZ_STRINGS], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in FUZZ_STRINGS:
        assert got[s] == spark_xxhash64(s), repr(s)


def test_string_int_chain_matches_spark(spark):
    """The minhash_signature shape: xxhash64(shingle, i) with i an
    IntegerType sequence element — string hash seeded 42, then the int
    chained with the previous hash as seed."""
    rows = [(s, i) for s in FUZZ_STRINGS[:20] for i in range(16)]
    df = spark.createDataFrame(rows, "s string, i int")
    got = df.select("s", "i",
                    F.xxhash64("s", F.col("i")).alias("h")).collect()
    for r in got:
        assert r["h"] == spark_xxhash64(r["s"], ("int", r["i"])), (r["s"], r["i"])


def test_long_array_hash_matches_spark(spark):
    """The band_keys shape: xxhash64 of an array<long> slice — elements
    seed-chained as longs."""
    rng = random.Random(13)
    arrays = [[rng.randrange(-(2**63), 2**63) for _ in range(n)]
              for n in (1, 2, 3, 5, 16)] + [[0, 0], [-1, 1], [2**63 - 1, -(2**63)]]
    df = spark.createDataFrame([(a,) for a in arrays], "a array<long>")
    got = [(r["a"], r["h"]) for r in df.select("a", F.xxhash64("a").alias("h")).collect()]
    for a, h in got:
        assert h == spark_xxhash64(list(a)), a


def test_long_scalar_and_seed_chain(spark):
    vals = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == spark_xxhash64(v), v


@pytest.mark.parametrize("n", [0, 1, 4, 7, 8, 9, 31, 32, 33, 64, 100])
def test_binary_lengths(spark, n):
    data = bytes(range(256))[:n] if n <= 256 else None
    data = (bytes(range(256)) * 4)[:n]
    df = spark.createDataFrame([(data,)], "b binary")
    h = df.select(F.xxhash64("b").alias("h")).collect()[0]["h"]
    assert h == spark_xxhash64(data)
