"""Dedup suite: exact, MinHash-LSH near-dup, SimHash, n-gram Jaccard,
embedding near-dup, and the end-to-end dedup operator."""

import pytest
from pyspark.sql import functions as F

from amharic_ecommerce_data_extractor_spark.operators import dedup as dd

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),          # near dup of 0
    (3, "completely unrelated text about spark engines"),
    (4, "completely unrelated text about spark engines here"),   # near dup of 3
    (5, "something else entirely different from all others"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    rows = dd.exact_duplicates(docs).collect()
    assert len(rows) == 1
    assert rows[0]["n_copies"] == 2
    assert rows[0]["keep_id"] == 0
    assert rows[0]["all_ids"] == [0, 1]


def test_minhash_pairs(spark, docs):
    pairs = {(r["src"], r["dst"]): r["jaccard"]
             for r in dd.minhash_duplicate_pairs(docs, threshold=0.3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert (3, 4) in pairs
    assert all(5 not in p for p in pairs)


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r["src"], r["dst"]) for r in dd.ngram_jaccard_pairs(docs, n=2, threshold=0.4).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs


def test_simhash_identical_for_same_text(spark, docs):
    groups = dd.simhash_duplicates(docs).collect()
    assert any(g["ids"] == [0, 1] or set([0, 1]) <= set(g["ids"]) for g in groups)


def test_simhash_is_deterministic_bitstring(spark, docs):
    fps = docs.select(dd.simhash64(F.col("text")).alias("h")).collect()
    again = docs.select(dd.simhash64(F.col("text")).alias("h")).collect()
    assert [r["h"] for r in fps] == [r["h"] for r in again]
    assert all(len(r["h"]) == 64 and set(r["h"]) <= {"0", "1"} for r in fps)
    # near-dup texts have small Hamming distance, unrelated texts large
    h = {r["doc_id"]: r["h"] for r in
         docs.select("doc_id", dd.simhash64(F.col("text")).alias("h")).collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(h[0], h[2]) < ham(h[0], h[3])


def test_embedding_duplicate_pairs(spark):
    import random

    rng = random.Random(42)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    far = [rng.gauss(0, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [float(x) for x in near]),
         (2, [float(x) for x in far])],
        "vec_id long, embedding array<float>")
    pairs = {(r["src"], r["dst"]) for r in dd.embedding_duplicate_pairs(df, threshold=0.99).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_dedup_end_to_end(spark, docs):
    kept = sorted(r["doc_id"] for r in dd.dedup(docs, threshold=0.3).collect())
    # 0/1/2 collapse to 0; 3/4 collapse to 3; 5 stays
    assert kept == [0, 3, 5]


def test_star_pair_mode_same_dedup_result_with_linear_edges(spark):
    """pair_mode='star' must produce the SAME dedup() survivors as the full
    clique for duplicate clusters, while emitting O(cluster) candidate
    edges instead of O(cluster^2)."""
    from amharic_ecommerce_data_extractor_spark.operators.dedup import (
        dedup,
        minhash_duplicate_pairs,
    )

    # 3 clusters of identical text (sizes 30, 20, 10) + 15 unique docs:
    # near-dup pairs after exact dedup are none, so also test pre-exact pairs
    rows = []
    i = 0
    for size, base in ((30, "alpha beta gamma delta epsilon"),
                       (20, "one two three four five six"),
                       (10, "red green blue cyan magenta")):
        for k in range(size):
            rows.append((i, base + ("" if k == 0 else f" tail{k % 3}")))
            i += 1
    for k in range(15):
        rows.append((i, f"unique document number {k} with words {k * 7} {k * 13}"))
        i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    all_pairs = minhash_duplicate_pairs(df, threshold=0.5)
    star_pairs = minhash_duplicate_pairs(df, threshold=0.5, pair_mode="star")
    n_all, n_star = all_pairs.count(), star_pairs.count()
    assert n_star < n_all  # linear vs quadratic growth in cluster size

    kept_all = sorted(r["doc_id"] for r in
                      dedup(df, threshold=0.5, pair_mode="all").collect())
    kept_star = sorted(r["doc_id"] for r in
                       dedup(df, threshold=0.5, pair_mode="star").collect())
    assert kept_all == kept_star
    # 'star' is the dedup() default (the CC consumer)
    kept_default = sorted(r["doc_id"] for r in dedup(df, threshold=0.5).collect())
    assert kept_default == kept_star


def test_star_candidate_edges_linear_in_cluster_size(spark):
    """A 10k-member duplicate cluster must emit exactly n-1 candidate edges
    in star mode (the clique would emit ~5*10^7) — the property that keeps
    CC-based dedup alive on corpora with mega-duplicate clusters."""
    from pyspark.sql import functions as F

    from amharic_ecommerce_data_extractor_spark.operators.linking import (
        banded_candidate_pairs,
        minhash_signature,
    )

    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("nid"),
        F.array(F.lit("alpha beta gamma"), F.lit("beta gamma delta")).alias("shingles"))
    sig_df = df.withColumn("minhash",
                           minhash_signature(F.col("shingles"), 16)).localCheckpoint()
    star = banded_candidate_pairs(sig_df, bands=8, rows=2, pair_mode="star")
    assert star.count() == n - 1
    # every edge is hub -> member with the hub the global min id here
    assert star.agg(F.max("src")).first()[0] == 0


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS): parity vs an independent per-string Python
# reference, the substring-match guarantee, and the stop-fingerprint cap.
# ---------------------------------------------------------------------------

_WMOD = 2147483647


def _ref_winnow(text, k=5, w=8):
    """Independent eager winnowing (Schleimer et al. 2003, Fig. 5 semantics:
    per window of w k-gram hashes select the min, rightmost on ties)."""
    import hashlib

    n = len(text) - k + 1
    if n < 1:
        return set()
    hs = [int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:15], 16) % _WMOD
          for i in range(n)]
    sel = set()
    for s in range(max(1, n - w + 1)):
        window = hs[s:s + w]
        m = min(window)
        idx = max(i for i, v in enumerate(window) if v == m)
        sel.add((s + idx + 1, m))  # 1-based position
    return sel


WINNOW_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs, the quick brown fox jumps over it"),
    (2, "ሱቅ ዋጋ 1000 ብር አዲስ አበባ ውስጥ የሚሸጥ ስልክ"),   # multi-byte chars
    (3, "short"),                                          # fewer than w k-grams
    (4, "abcd"),                                           # shorter than k: no grams
    (5, "aaaaaaaaaaaaaaaaaaaa"),                           # all-tied hashes
]


def test_winnowing_matches_reference_implementation(spark):
    df = spark.createDataFrame(WINNOW_DOCS, "doc_id long, text string")
    got = {}
    for r in dd.winnowing_fingerprints(df, hash_fn="md5").collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fp"]))
    for i, t in WINNOW_DOCS:
        assert got.get(i, set()) == _ref_winnow(t), f"doc {i}"


def test_winnowing_tie_rule_picks_rightmost(spark):
    # all k-grams of 'aaaa...' are identical → every window's min is tied;
    # rightmost-on-ties: window start s (1..n-w+1) selects position s+w-1,
    # NOT a run of position-1 re-selections collapsing to one fingerprint
    df = spark.createDataFrame([(0, "a" * 30)], "doc_id long, text string")
    rows = dd.winnowing_fingerprints(df, k=5, w=8, hash_fn="md5").collect()
    poss = sorted(r["pos"] for r in rows)
    assert len(set(r["fp"] for r in rows)) == 1
    assert poss == list(range(8, 27))  # n=26 k-grams, starts 1..19 → pos 8..26


def test_winnowing_guarantee_shared_substring(spark):
    # any shared substring of length >= w + k - 1 (=12) must share >= 1 fp
    shared = "zq9xv7wkp3mt"  # 12 chars, unlikely elsewhere
    df = spark.createDataFrame(
        [(0, "prefix one " + shared + " tail A"),
         (1, "completely different beginning " + shared)],
        "doc_id long, text string")
    fps = {}
    for r in dd.winnowing_fingerprints(df, k=5, w=8, hash_fn="md5").collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    assert fps[0] & fps[1]


def test_fingerprint_overlap_pairs_and_stop_fp_cap(spark):
    boiler = "this exact boilerplate sentence appears in every document here"
    rows = [(i, boiler) for i in range(10)]
    rows += [(100, "unique pair text alpha beta gamma delta epsilon zeta"),
             (101, "unique pair text alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # max_df=5: the 10-copy boilerplate's fingerprints are stop-fps → no
    # pairs among docs 0-9; the 2-copy unique pair survives
    pairs = {(r["src"], r["dst"]) for r in
             dd.fingerprint_overlap_pairs(df, min_shared=3, max_df=5,
                                          hash_fn="md5").collect()}
    assert pairs == {(100, 101)}
    # with the cap lifted the clique comes back
    pairs_all = {(r["src"], r["dst"]) for r in
                 dd.fingerprint_overlap_pairs(df, min_shared=3, max_df=100,
                                              hash_fn="md5").collect()}
    assert (0, 1) in pairs_all and (100, 101) in pairs_all
    assert len(pairs_all) == 45 + 1


def test_winnowing_prod_hash_same_positions_structure(spark):
    # xxhash64 variant: same structural invariants (valid positions, density
    # bound: at most one selection per window start)
    df = spark.createDataFrame(WINNOW_DOCS, "doc_id long, text string")
    rows = dd.winnowing_fingerprints(df, k=5, w=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    for i, t in WINNOW_DOCS:
        n = len(t) - 4
        if n < 1:
            assert i not in by_doc
            continue
        sels = by_doc[i]
        assert all(1 <= r["pos"] <= n for r in sels)
        assert len(sels) <= max(1, n - 7)


def test_winnowing_randomized_batch_parity(spark):
    # 60 seeded random docs (ASCII + Ethiopic + punctuation mix, lengths
    # 0..120) through ONE Spark job, each compared exactly to the eager
    # reference — the fuzz complement to the fixed edge cases above
    import random

    rng = random.Random(42)
    alphabet = "ab cde ፩፪፻ ብርዋጋ .!?,;:# @xyz0123"
    docs = [(i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 121))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in dd.winnowing_fingerprints(df, hash_fn="md5").collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fp"]))
    for i, t in docs:
        assert got.get(i, set()) == _ref_winnow(t), f"doc {i}: {t!r}"


def test_winnowing_chunked_equals_unchunked(spark):
    # the giant-doc path: max_chars chunking with w+k-2 overlap must be
    # selection-for-selection identical to the unchunked run — including
    # global positions, tie runs spanning chunk boundaries, and docs whose
    # final chunk is shorter than k or shorter than w k-grams
    import random

    rng = random.Random(7)
    alphabet = "abcde ፩፪ብር .!x"
    docs = [(i, "".join(rng.choice(alphabet) for _ in range(n)))
            for i, n in enumerate([0, 3, 5, 11, 12, 59, 60, 61, 62, 119, 120,
                                   121, 180, 300, 301])]
    docs.append((900, "a" * 200))        # ties across every boundary
    docs.append((901, "ab" * 150))       # period-2 ties
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def collect(fps):
        out = {}
        for r in fps.collect():
            out.setdefault(r["id"], set()).add((r["pos"], r["fp"]))
        return out

    plain = collect(dd.winnowing_fingerprints(df, hash_fn="md5"))
    for mc in (12, 13, 60, 64):  # 12 = minimum legal (w + k - 1)
        chunked = collect(dd.winnowing_fingerprints(df, hash_fn="md5",
                                                    max_chars=mc))
        assert chunked == plain, f"max_chars={mc}"
    with pytest.raises(ValueError):
        dd.winnowing_fingerprints(df, max_chars=11)


def test_winnowing_positions_beyond_2_20_exact(spark):
    # regression: with a 2^20 packing width, positions past 1,048,575
    # underflowed the pack (fp decoded as hash-1, pos wrapped). The 2^32
    # width makes every representable document exact — pin it with a
    # 1.06M-char doc compared selection-for-selection to the eager reference.
    # max_chars REQUIRED here: it is both the straggler bound and the cost
    # bound (unchunked per-gram substr re-seeks from the string start —
    # O(L²) byte scans on a megabyte doc; see winnowing_fingerprints).
    import random

    rng = random.Random(99)
    text = "".join(rng.choice("abcdefgh ij") for _ in range(1_060_000))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {(r["pos"], r["fp"])
           for r in dd.winnowing_fingerprints(df, hash_fn="md5",
                                              max_chars=4096).collect()}
    exp = _ref_winnow(text)
    assert got == exp
    assert max(p for p, _ in got) > (1 << 20)  # the test actually crosses it


def test_dedup_winnowing_method(spark):
    """dedup(method='winnowing'): a doc sharing a long verbatim run with
    another collapses to one survivor (lowest id); vocabulary overlap alone
    stays below the min_shared bar."""
    from amharic_ecommerce_data_extractor_spark.operators.dedup import dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    copied = "INTRO " + base + " OUTRO"               # verbatim containment
    reordered = " ".join(reversed(base.split()))       # same words, new runs
    distinct = "completely different content with no overlap whatsoever here"
    rows = [(1, base), (2, copied), (3, reordered), (4, distinct), (5, base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    kept = sorted(r.doc_id for r in dedup(df, method="winnowing",
                                          winnow_min_shared=8).collect())
    # 5 is an exact dup of 1 (dropped); 2 contains the whole base verbatim —
    # 13 shared fingerprints with 1 (dropped); 3's reordering keeps only the
    # word-level 5-grams of the shared vocabulary — 5 shared fingerprints,
    # below the bar (kept); 4 kept. min_shared is what separates run-level
    # copying from mere vocabulary overlap.
    assert kept == [1, 3, 4]

    with pytest.raises(ValueError, match="method"):
        dedup(df, method="nope")


def test_curate_winnowing_method(spark):
    from amharic_ecommerce_data_extractor_spark.operators.curation import curate

    base = ("useful document body with enough words to pass the quality and "
            "length filters applied by the curation pipeline stage")
    rows = [(1, base, "a"), (2, "HDR " + base, "a"),
            (3, "another perfectly reasonable standalone document with plenty "
                "of distinct words in it", "b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    curated, audit = curate(docs, min_quality=0.0, min_tokens=1,
                            dedup_method="winnowing")
    assert sorted(r.doc_id for r in curated.collect()) == [1, 3]
    stages = {r.stage: r.rows_surviving for r in audit.collect()}
    assert stages["input"] == 3 and stages["dedup"] == 2
