"""q51_video_frame_features: rows-only in the driver (the RIFF-AVI decode +
numpy grid features are not SQL-expressible in DuckDB), so its VALUES are
pinned here instead — the whole aggregate is recomputed in pure Python from
the same documents parquet (sha-derived fallback frames) plus the exact
closed-form features of the two synthesized AVI clips."""

import hashlib

import pyarrow.parquet as pq

from amharic_ecommerce_data_extractor_spark.queries import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _expected(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_frames = n_media = 0
    sum_first = 0.0
    for text in tbl.column("text").to_pylist():
        payload = b"raw:" + (text or "").encode("utf-8")
        dig = hashlib.sha256(payload).digest()
        n = 1 + dig[2] % 120
        idxs = range(0, n, 30)
        n_media += 1
        for i in idxs:
            fd = hashlib.sha256(payload + i.to_bytes(4, "little")).digest()
            sum_first += fd[0] / 255.0
            n_frames += 1
    # real clips: 61 frames (sampled 0/30/60, gray 0/90/180) + 31 frames
    # (sampled 0/30, gray 0/90); first feature = gray/255 exactly
    real = [0.0, 90 / 255.0, 180 / 255.0, 0.0, 90 / 255.0]
    n_media += 2
    n_real = len(real)
    n_frames += n_real
    sum_first += sum(real)
    return n_frames, n_media, n_real, round(sum_first, 6)


def test_q51_values_vs_pure_python(spark):
    row = SPARK_QUERIES["q51_video_frame_features"](spark, SF_DIR).collect()[0]
    n_frames, n_media, n_real, sum_first = _expected(SF_DIR)
    assert row["n_frames"] == n_frames
    assert row["n_media"] == n_media
    assert row["n_real_frames"] == n_real
    assert abs(row["sum_first_feature"] - sum_first) < 1e-4


def test_q51_registers_after_oracle_backed():
    names = list(SPARK_QUERIES)
    assert names.index("q51_video_frame_features") >= 50
