"""jobs/dedup_media.py: image+video dedup end-to-end on REAL decoded bytes
(PPM/BMP/y4m), with manifests and resume."""

from __future__ import annotations

import numpy as np
import pytest

from consult_spark.operators import multimodal as MM
from jobs.dedup_media import run_media_pipeline

from test_sources_multimodal import encode_bmp, encode_ppm, encode_y4m


@pytest.fixture(scope="module")
def media(spark):
    rng = np.random.default_rng(99)
    base = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    brighter = np.clip(base.astype(np.int32) + 8, 0, 255).astype(np.uint8)
    loner = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    img_rows = [
        ("img_a", encode_ppm(base), 32, 32, "ppm"),
        ("img_b", encode_bmp(brighter), 32, 32, "bmp"),   # dup of img_a
        ("img_c", encode_ppm(loner), 32, 32, "ppm"),
        ("img_bad", b"P6\n2 2\n255\nxx", 2, 2, "ppm"),    # corrupt
    ]
    shared = [rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8) for _ in range(4)]
    extra = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    other = [rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8) for _ in range(4)]
    vid_rows = [
        ("vid_a", encode_y4m(shared), 1.0, 4000, "y4m"),
        ("vid_b", encode_y4m(shared[:3] + [extra]), 1.0, 4000, "y4m"),  # dup of vid_a
        ("vid_c", encode_y4m(other), 1.0, 4000, "y4m"),
    ]
    return (
        spark.createDataFrame(img_rows, MM.IMAGES_SCHEMA),
        spark.createDataFrame(vid_rows, MM.VIDEOS_SCHEMA),
    )


def test_media_job_end_to_end(spark, media, tmp_path):
    images, videos = media
    res = run_media_pipeline(spark, images, videos, str(tmp_path / "wh"))
    clusters = {
        r["clip_id"]: r["cluster_id"] for r in res["tables"]["media_clusters"].collect()
    }
    # planted dups cluster together; unrelated items stay singletons
    assert clusters["img_a"] == clusters["img_b"]
    assert clusters["vid_a"] == clusters["vid_b"]
    assert clusters["img_c"] not in (clusters["img_a"],)
    # images never cluster with videos (different shingle spaces)
    assert clusters["img_a"] != clusters["vid_a"]
    uniques = {r["clip_id"] for r in res["tables"]["media_unique"].collect()}
    assert "img_c" in uniques and "vid_c" in uniques and "img_a" not in uniques
    # the corrupt image is carried as a decode-failed singleton, not dropped
    assert "img_bad" in clusters
    confirmed = res["tables"]["media_confirmed"]
    assert confirmed.filter("clip_a = 'img_a' AND clip_b = 'img_b'").count() == 1
    # manifests exist for every stage (the resume contract)
    wh = res["warehouse"]
    for t in ("media_features", "media_buckets", "media_candidates",
              "media_confirmed", "media_clusters", "media_unique"):
        assert wh.manifest(t)["rows"] >= 0


def test_media_job_resume_skips_stages(spark, media, tmp_path):
    images, videos = media
    d = str(tmp_path / "wh")
    run_media_pipeline(spark, images, videos, d)
    res2 = run_media_pipeline(spark, images, videos, d, resume=True)
    # every stage skipped: zero rebuild time recorded
    assert all(v == 0.0 for v in res2["timings"].values())
    clusters = {
        r["clip_id"]: r["cluster_id"] for r in res2["tables"]["media_clusters"].collect()
    }
    assert clusters["img_a"] == clusters["img_b"]


def test_media_job_images_only(spark, media, tmp_path):
    images, _ = media
    res = run_media_pipeline(spark, images, None, str(tmp_path / "wh"))
    clusters = {
        r["clip_id"]: r["cluster_id"] for r in res["tables"]["media_clusters"].collect()
    }
    assert clusters["img_a"] == clusters["img_b"]


def test_media_golden_oracle_pin(spark):
    """Engine image-dedup output == the independent oracle's golden table
    (pure-python decode + big-int hashing, scripts/gen_media_oracle.py),
    and every planted brightness-shift variant is recovered."""
    import os

    import __spark_entry__ as E

    q = E.queries()["media_confirmed_pairs"]
    got = sorted(tuple(r) for r in q(spark, "unused").collect())
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "oracle_media_confirmed.parquet"
    )
    exp = sorted(tuple(r) for r in spark.read.parquet(fixture).collect())
    assert got == exp and len(got) > 0
    # planted recall: base img_X_0 must pair with its variant img_X_1
    pairs = {(a, b) for a, b, *_ in got}
    from consult_spark.datagen import generate_image_corpus_pandas

    ids = set(generate_image_corpus_pandas(120, 42)["img_id"])
    planted = {(i[:-2] + "_0", i) for i in ids if i.endswith("_1")}
    assert planted <= pairs


def test_video_golden_oracle_pin(spark):
    """Engine video-dedup output == the independent oracle's golden table;
    19 of the 20 planted 3/4-shared-frame variants clear the 0.60 threshold
    (the 20th is borderline by construction — the spec's answer, both
    sides)."""
    import os

    import __spark_entry__ as E

    q = E.queries()["video_confirmed_pairs"]
    got = sorted(tuple(r) for r in q(spark, "unused").collect())
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "oracle_video_confirmed.parquet"
    )
    exp = sorted(tuple(r) for r in spark.read.parquet(fixture).collect())
    assert got == exp and len(got) >= 19
