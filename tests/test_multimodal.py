"""Multimodal column plumbing: deterministic synth, fake-decode feature
extraction vs a pure-numpy oracle, frame sampling, resize, stub gating."""

import numpy as np
import pytest

from rt_etl_yahoo_search_engine_spark.functions import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    df = mm.synth_media_df(docs)
    df.persist()
    yield df
    df.unpersist()


def test_synth_deterministic(spark, media):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    again = {
        r["doc_id"]: bytes(r["payload"])
        for r in mm.synth_media_df(docs).collect()
    }
    for r in media.collect():
        assert bytes(r["payload"]) == again[r["doc_id"]]
        assert bytes(r["payload"]) == mm.payload_bytes(r["doc_id"])


def test_metadata_matches_payload(media):
    for r in media.collect():
        meta = mm._meta_for(r["doc_id"])
        assert r["media_type"] == meta["media_type"]
        assert len(r["payload"]) == meta["payload_len"]
        if r["media_type"] == "image":
            assert len(r["payload"]) == r["width"] * r["height"]
        elif r["media_type"] == "video":
            assert len(r["payload"]) == r["n_frames"] * mm.VIDEO_FRAME_BYTES
        else:
            assert len(r["payload"]) == r["n_samples"]


def test_image_features_match_numpy_oracle(media):
    rows = {r["doc_id"]: r for r in mm.image_features(media, thumb=4).collect()}
    assert rows
    for r in media.filter("media_type = 'image'").collect():
        px = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        img = px.reshape(r["height"], r["width"])
        got = rows[r["doc_id"]]
        assert got["n_bytes"] == px.size
        assert got["px_mean"] == pytest.approx(px.mean())
        assert got["px_std"] == pytest.approx(px.std())
        assert got["px_min"] == px.min() and got["px_max"] == px.max()
        assert got["hist"] == np.bincount(px >> 4, minlength=16).tolist()
        assert sum(got["hist"]) == px.size
        ref_thumb = mm.resize_nearest(img, 4, 4)
        assert got["thumb_mean"] == pytest.approx(ref_thumb.mean())


def test_audio_features_match_numpy_oracle(media):
    rows = {r["doc_id"]: r for r in mm.audio_features(media).collect()}
    assert rows
    for r in media.filter("media_type = 'audio'").collect():
        s = np.frombuffer(bytes(r["payload"]), dtype=np.uint8).astype(np.int16) - 128
        got = rows[r["doc_id"]]
        assert got["n_samples"] == r["n_samples"] == s.size
        assert got["rms"] == pytest.approx(np.sqrt(np.mean(s.astype(float) ** 2)))
        assert got["peak"] == np.abs(s).max()
        assert got["zero_crossings"] == int(
            np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))
        )


def test_frame_sampling_offsets_and_bytes(media):
    frames = mm.sample_frames(media, every=2).collect()
    assert frames
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'video'").collect()
    }
    per_doc: dict[int, list] = {}
    for f in frames:
        per_doc.setdefault(f["doc_id"], []).append(f)
        assert f["frame_idx"] % 2 == 0
        assert f["frame_off"] == f["frame_idx"] * mm.VIDEO_FRAME_BYTES
        assert f["frame_len"] == mm.VIDEO_FRAME_BYTES
        src = payloads[f["doc_id"]]
        assert bytes(f["frame"]) == src[f["frame_off"] : f["frame_off"] + f["frame_len"]]
    for doc_id, fs in per_doc.items():
        nf = mm._meta_for(doc_id)["n_frames"]
        assert len(fs) == (nf + 1) // 2  # every 2nd frame, starting at 0


def test_resize_nearest_known_case():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = mm.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel becomes a 2x2 block
    assert (up[0:2, 0:2] == img[0, 0]).all()
    assert (up[6:8, 6:8] == img[3, 3]).all()
    down = mm.resize_nearest(img, 2, 2)
    assert down.tolist() == [[0, 2], [8, 10]]


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.decode_image(b"\xff\xd8\xff")


def test_meta_sql_matches_python():
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, {mm.META_SQL['media_type'].replace('doc_id', 'i')},"
        f" {mm.META_SQL['payload_len'].replace('doc_id', 'i')}"
        " FROM unnest(range(0, 100)) AS t(i)"
    ).fetchall()
    for i, mt, plen in rows:
        meta = mm._meta_for(i)
        assert mt == meta["media_type"]
        assert plen == meta["payload_len"]
