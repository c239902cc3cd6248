"""Multimodal plumbing tests: audio feature extraction vs a numpy
oracle, the 1→N video frame-sample explosion, the NotImplementedError
stub seam for real codecs, and nearest-neighbor image resize."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmospark import multimodal as mm


@pytest.fixture(scope="module")
def audio_df(spark):
    return spark.createDataFrame(mm.gen_audio(40, sample_rate=4000), schema=mm.AUDIO_SCHEMA)


@pytest.fixture(scope="module")
def video_df(spark):
    return spark.createDataFrame(mm.gen_video(30), schema=mm.VIDEO_SCHEMA)


class TestAudio:
    def test_features_match_numpy_oracle(self, spark, audio_df):
        got = {r["audio_id"]: r for r in mm.audio_features(audio_df).collect()}
        for row in mm.gen_audio(40, sample_rate=4000):
            s = mm._audio_samples(row["audio_id"], row["n_samples"] * row["channels"]).astype(
                np.int64
            )
            total = len(s)
            g = got[row["audio_id"]]
            assert g["bytes_ok"]
            assert g["duration_sec"] == round(row["n_samples"] / row["sample_rate"], 6)
            assert g["rms"] == round(float(np.sqrt(int(np.sum(s * s)) / total)), 3)
            assert g["zero_crossings"] == int(
                np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))
            )
            assert g["clip_ratio"] == round(
                int(np.count_nonzero(np.abs(s) >= 32000)) / total, 4
            )

    def test_unknown_codec_is_stubbed(self, spark):
        df = spark.createDataFrame(
            [
                {
                    "audio_id": 0,
                    "bytes": b"OGGS1234",
                    "codec": "ogg",
                    "sample_rate": 44100,
                    "n_samples": 10,
                    "channels": 2,
                    "caption": "x",
                }
            ],
            schema=mm.AUDIO_SCHEMA,
        )
        with pytest.raises(Exception, match="real decoder"):
            mm.audio_features(df).collect()


class TestVideo:
    def test_frame_sample_explosion(self, spark, video_df):
        out = mm.video_frame_sample(video_df, every=4).collect()
        rows = mm.gen_video(30)
        expected = sum(len(range(0, r["n_frames"], 4)) for r in rows)
        assert len(out) == expected
        # frame content matches an independent decode
        by_key = {(r["video_id"], r["frame_idx"]): r for r in out}
        for vid in (0, 7, 29):
            nf = rows[vid]["n_frames"]
            for f in range(0, nf, 4):
                fr = mm._video_frame(vid, f, 8, 8)
                g = by_key[(vid, f)]
                assert g["first_px"] == int(fr.reshape(-1)[0])
                assert g["mean_px"] == round(float(fr.mean()), 4)

    def test_emit_bytes_round_trip(self, spark, video_df):
        out = mm.video_frame_sample(video_df.limit(3), every=8, emit_bytes=True).collect()
        for r in out:
            fr = np.frombuffer(r["frame_bytes"], np.uint8).reshape(8, 8, 3)
            exp = mm._video_frame(r["video_id"], r["frame_idx"], 8, 8)
            assert (fr == exp).all()

    def test_first_px_sql_matches_python(self, spark):
        # the portable SQL re-derivation of the fake frame content must
        # match the numpy decoder — this is what lets DuckDB oracle-check
        # decoded video content without a decoder
        import duckdb

        expr = mm.first_px_expr("vid", "f")
        rows = duckdb.sql(
            f"SELECT vid, f, {expr} AS px FROM (VALUES (0, 0), (3, 2), (29, 28), (7, 4))"
            " t(vid, f)"
        ).fetchall()
        for vid, f, px in rows:
            assert px == int(mm._video_frame(vid, f, 8, 8).reshape(-1)[0]), (vid, f)


class TestResize:
    def test_nearest_neighbor_resize(self, spark):
        from cosmospark import codecs
        from cosmospark.fixtures import gen_images
        from cosmospark.ztypes import IMAGES_SCHEMA

        imgs = spark.createDataFrame(gen_images(20, seed=9), schema=IMAGES_SCHEMA)
        out = {r["image_id"]: r for r in mm.resize_images(imgs, 8).collect()}
        src = {r["image_id"]: r for r in gen_images(20, seed=9)}
        idx = (np.arange(8) * 16 // 8).astype(np.int64)
        for iid, r in out.items():
            assert r["w"] == 8 and r["h"] == 8
            got = codecs.decode_raw_batch([r["bytes"]], 8, 8)[0]
            s = src[iid]
            if s["fmt"] == "raw":
                pix = codecs.decode_raw_batch([s["bytes"]], 16, 16)[0]
            else:
                pix = codecs.decode_lossy_batch([s["bytes"]], 16, 16)[0]
            assert (got == pix[idx][:, idx]).all()
