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


def test_stdlib_png_gif_round_trip():
    """REAL stdlib decoders (round 5): PNG (all color types we emit, all
    filter rows) and GIF (LZW first frame + palette) round-trip exactly
    against the independent stdlib encoders; JPEG stays hook-only."""
    import numpy as np

    rng = np.random.default_rng(42)
    for shape in ((13, 17, 3), (5, 9, 1), (6, 4, 4), (1, 1, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = M._decode_png(M.encode_png(img))
        assert np.array_equal(dec, img if shape[2] > 1 else img), shape
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (11, 14), dtype=np.uint8)
    assert np.array_equal(M._decode_gif(M.encode_gif(pal, idx)), pal[idx])
    assert M.gif_frame_count(M.encode_gif(pal, idx)) == 1
    with pytest.raises(NotImplementedError):
        M.stdlib_decode_image(b"\xff\xd8\xff\xe0jpeg")


def test_png_filter_reconstruction():
    """The decoder undoes ALL five PNG scanline filters — exercised with a
    hand-built IDAT using filters 0..4 on known pixel data."""
    import struct
    import zlib

    import numpy as np

    w, h, nch = 4, 5, 3
    img = (np.arange(w * h * nch, dtype=np.uint32) * 37 % 256).astype(
        np.uint8).reshape(h, w, nch)
    # build filtered scanlines per the spec (the encoder's inverse)
    lines = []
    prev = np.zeros(w * nch, np.int32)
    for y in range(h):
        cur = img[y].ravel().astype(np.int32)
        f = y % 5
        out = np.empty_like(cur)
        for x in range(w * nch):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + out.astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(lines)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    assert np.array_equal(M._decode_png(png), img)


def test_default_decoder_dispatch(spark):
    """extract_media_features with the default kernel: real dims for valid
    PNG/GIF payloads, deterministic fake for hook-only formats."""
    import numpy as np

    rng = np.random.default_rng(3)
    png = M.encode_png(rng.integers(0, 256, (21, 9, 3), dtype=np.uint8))
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    gif = M.encode_gif(pal, rng.integers(0, 256, (7, 12), dtype=np.uint8))
    rows = [
        {"media_id": 1, "url": "http://h/a.png", "payload": png,
         "meta": {"media_type": "image", "format": "png", "bytes": len(png)}},
        {"media_id": 2, "url": "http://h/b.gif", "payload": gif,
         "meta": {"media_type": "image", "format": "gif", "bytes": len(gif)}},
        {"media_id": 3, "url": "http://h/c.jpg",
         "payload": b"\xff\xd8\xff\xe0" + b"j" * 100,
         "meta": {"media_type": "image", "format": "jpeg", "bytes": 104}},
    ]
    out = {
        r.media_id: r
        for r in M.extract_media_features(
            spark.createDataFrame(rows, M.MEDIA_SCHEMA)
        ).collect()
    }
    assert (out[1].height, out[1].width, out[1].channels) == (21, 9, 3)
    assert (out[2].height, out[2].width, out[2].channels) == (7, 12, 3)
    assert (out[3].height, out[3].width) == (16, 16)  # fake fallback
    assert out[2].format == "gif"


def test_gif_multi_frame_count_and_first_frame():
    """A hand-assembled two-frame GIF (second image descriptor + LZW block
    appended before the trailer): gif_frame_count sees both frames, the
    decoder returns the FIRST frame's pixels."""
    import numpy as np

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    f1 = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    f2 = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    g1 = M.encode_gif(pal, f1)
    g2 = M.encode_gif(pal, f2)
    # splice: g1 without the 1-byte trailer (keep its sub-block
    # terminator) + g2's image descriptor..trailer (g2's descriptor
    # starts right after header+LSD+GCT = 13 + 768 bytes)
    two = g1[:-1] + g2[13 + 768:]
    assert M.gif_frame_count(two) == 2
    assert np.array_equal(M._decode_gif(two), pal[f1])
