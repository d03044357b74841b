"""Multimodal plumbing: schema, sniffing, feature stage, frame sampling.

The decode kernel is a deterministic fake (real codecs aren't in this
sandbox — functions/multimodal.py docstring); everything Spark-side is real.
"""

import pytest

from crusty_core_spark.functions import multimodal as M


def _media_rows():
    return [
        (1, "http://h/x.png", b"\x89PNG\r\n" + b"a" * 500, ("image", "png", 506)),
        (2, "http://h/y.jpg", b"\xff\xd8\xff\xe0" + b"b" * 300, ("image", "jpeg", 304)),
        (3, "http://h/z.wav", b"RIFF" + b"c" * 200, ("audio", "wav", 204)),
        (4, "http://h/v.mp4", b"\x00\x00\x00\x18ftyp" + b"d" * 900, ("video", "mp4", 908)),
        (5, "http://h/u.bin", b"??" * 10, ("unknown", "unknown", 20)),
    ]


def _media_df(spark):
    rows = [
        {"media_id": i, "url": u, "payload": p,
         "meta": {"media_type": m[0], "format": m[1], "bytes": m[2]}}
        for i, u, p, m in _media_rows()
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_sniffing():
    for _, _, payload, (mtype, fmt, _) in _media_rows():
        assert M.sniff_media(payload) == (mtype, fmt)
    assert M.sniff_media(None) == ("unknown", "unknown")


def test_feature_stage_schema_and_determinism(spark):
    df = _media_df(spark)
    out = M.extract_media_features(df)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert len(r.feature) == M.FEATURE_DIM
    assert rows[1].media_type == "image" and rows[1].format == "png"
    assert rows[1].height == 16 and rows[1].channels == 3
    # deterministic across runs
    rows2 = {r.media_id: r for r in M.extract_media_features(df).collect()}
    assert rows[1].feature == rows2[1].feature


def test_frame_sampling_fanout(spark):
    df = _media_df(spark)
    frames = M.sample_frames(df, n_frames=4)
    assert frames.count() == 5 * 4
    one = sorted(
        (r.frame_idx, len(r.frame))
        for r in frames.filter("media_id = 4").collect()
    )
    assert [i for i, _ in one] == [0, 1, 2, 3]
    assert all(n > 0 for _, n in one)


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        M._real_decode_unavailable(b"bytes")
