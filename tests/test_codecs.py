"""Pure-stdlib PNG/WAV codecs + the real (non-stub) multimodal paths.

The PNG decoder must invert ANY spec-compliant encoder, so beyond the
round-trip against our own filter-0 encoder, a manual reference encoder
here produces streams using every filter type (Sub/Up/Average/Paeth) and
asserts the decoder recovers the exact pixels.
"""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions import multimodal
from krnel_graph_spark.functions.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    is_png,
    is_wav,
)

RNG = np.random.RandomState(42)


# ------------------------------------------------------------------ #
# PNG                                                                 #
# ------------------------------------------------------------------ #


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (3, 5), (17, 9), (64, 64), (5, 3, 3), (8, 4, 4), (1, 7, 3)],
)
def test_png_roundtrip(shape):
    pixels = RNG.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(pixels))
    assert out.shape == pixels.shape
    assert np.array_equal(out, pixels)


def _reference_encode(pixels: np.ndarray, ftypes: list[int]) -> bytes:
    """Spec-faithful forward filtering with an arbitrary per-row filter
    schedule — an independent reimplementation the decoder must invert."""
    arr = np.asarray(pixels, dtype=np.uint8)
    channels = 1 if arr.ndim == 2 else arr.shape[2]
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * channels).astype(int)
    bpp = channels
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=int)
    for y in range(h):
        line = flat[y]
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((line[i] - pred) % 256)
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_decode_all_filters(ftypes, channels):
    shape = (11, 7) if channels == 1 else (11, 7, channels)
    pixels = RNG.randint(0, 256, size=shape).astype(np.uint8)
    data = _reference_encode(pixels, ftypes)
    assert np.array_equal(decode_png(data), pixels)


def test_png_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    good = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    good[-7] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    assert is_png(bytes(good))
    assert not is_png(b"JFIF")


# ------------------------------------------------------------------ #
# WAV                                                                 #
# ------------------------------------------------------------------ #


def test_wav_roundtrip_mono_and_stereo():
    mono = RNG.randint(-32768, 32767, size=500).astype(np.int16)
    rate, arr = decode_wav(encode_wav(mono, 22050))
    assert rate == 22050 and arr.shape == (500, 1)
    assert np.array_equal(arr[:, 0], mono)

    stereo = RNG.randint(-32768, 32767, size=(300, 2)).astype(np.int16)
    rate, arr = decode_wav(encode_wav(stereo, 8000))
    assert rate == 8000 and np.array_equal(arr, stereo)


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x00" * 64)
    assert not is_wav(b"\x00" * 64)
    assert is_wav(encode_wav(np.zeros(10, dtype=np.int16)))


# ------------------------------------------------------------------ #
# Real multimodal paths on Spark                                      #
# ------------------------------------------------------------------ #


@pytest.fixture()
def ids(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select("doc_id").orderBy("doc_id").limit(40)


def test_synth_png_pixel_stats_match_formula(ids):
    pngs = multimodal.synth_png_table(ids)
    pdf = multimodal.image_pixel_stats(pngs, "data", "doc_id").toPandas()
    assert len(pdf) == 40
    for r in pdf.itertuples():
        w = 16 + r.doc_id % 48
        h = 16 + (r.doc_id * 7) % 48
        col = (np.arange(h, dtype=np.int64) + r.doc_id) % 256
        assert (r.width, r.height) == (w, h)
        assert r.pix_sum == int(col.sum()) * w
        assert r.pix_min == int(col.min())
        assert r.pix_max == int(col.max())


def test_real_image_features_on_png(ids):
    pngs = multimodal.synth_png_table(ids)
    pdf = multimodal.extract_image_features(
        pngs, "data", "doc_id", feat_dim=8
    ).toPandas()
    assert len(pdf) == 40
    row = pdf[pdf.doc_id == pdf.doc_id.min()].iloc[0]
    doc_id = int(row.doc_id)
    h = 16 + (doc_id * 7) % 48
    col = ((np.arange(h, dtype=np.int64) + doc_id) % 256).astype(np.float64)
    assert row.features[0] == pytest.approx(col.mean(), rel=1e-6)
    assert row.features[2] == float(col.min())
    assert row.features[3] == float(col.max())


def test_real_resize_png(ids):
    pngs = multimodal.synth_png_table(ids)
    out = multimodal.resize_images(pngs, "data", "doc_id", 10, 6).toPandas()
    assert len(out) == 40
    for r in out.itertuples():
        arr = decode_png(bytes(r.data))
        assert arr.shape == (6, 10)
        # nearest-neighbor of a row-constant image stays row-constant
        assert (arr == arr[:, :1]).all()


def test_real_audio_features_on_wav(ids):
    wavs = multimodal.synth_wav_table(ids)
    stats = multimodal.audio_sample_stats(wavs, "data", "doc_id").toPandas()
    assert len(stats) == 40
    for r in stats.itertuples():
        n = 100 + r.doc_id % 400
        s = (np.arange(n, dtype=np.int64) + r.doc_id * 3) % 512 - 256
        assert r.sample_rate == 8000 and r.n_samples == n
        assert r.samp_sum == int(s.sum())
        assert (r.samp_min, r.samp_max) == (int(s.min()), int(s.max()))

    feats = multimodal.extract_audio_features(
        wavs, "data", "doc_id", feat_dim=8
    ).toPandas()
    row = feats[feats.doc_id == feats.doc_id.min()].iloc[0]
    doc_id = int(row.doc_id)
    n = 100 + doc_id % 400
    assert row.duration_s == pytest.approx(n / 8000.0)


def test_non_png_still_gated(ids, spark):
    payload = ids.select("doc_id", F.encode(F.lit("plain text"), "UTF-8").alias("b"))
    with pytest.raises(Exception, match="media libraries"):
        multimodal.extract_image_features(payload, "b", "doc_id").collect()


# ------------------------------------------------------------------ #
# Y4M                                                                 #
# ------------------------------------------------------------------ #


def test_y4m_roundtrip_mono():
    from krnel_graph_spark.functions.codecs import decode_y4m, encode_y4m, is_y4m

    frames = RNG.randint(0, 256, size=(7, 12, 10)).astype(np.uint8)
    data = encode_y4m(frames, fps=(30, 1))
    assert is_y4m(data)
    fps, out = decode_y4m(data)
    assert fps == (30, 1)
    assert np.array_equal(out, frames)


def test_y4m_roundtrip_420_luma():
    from krnel_graph_spark.functions.codecs import decode_y4m, encode_y4m

    frames = RNG.randint(0, 256, size=(3, 8, 6)).astype(np.uint8)
    fps, out = decode_y4m(encode_y4m(frames, chroma="420jpeg"))
    assert fps == (25, 1) and np.array_equal(out, frames)


def test_y4m_rejects_garbage():
    from krnel_graph_spark.functions.codecs import decode_y4m

    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"MPEG-not-really")
    with pytest.raises(ValueError, match="truncated|FRAME"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME\n\x00\x00")


def test_real_video_frame_stats(ids, spark):
    from krnel_graph_spark.functions.multimodal import (
        sample_frames,
        synth_y4m_table,
        video_frame_stats,
    )

    vids = synth_y4m_table(ids)
    pdf = video_frame_stats(vids, "data", "doc_id", every_n=3).toPandas()
    for r in pdf.itertuples():
        w = 8 + r.doc_id % 16
        h = 8 + (r.doc_id * 5) % 16
        col = (np.arange(h, dtype=np.int64) + r.doc_id + 3 * r.frame_idx) % 256
        assert (r.width, r.height) == (w, h)
        assert r.frame_idx % 3 == 0
        assert r.y_sum == int(col.sum()) * w
        assert (r.y_min, r.y_max) == (int(col.min()), int(col.max()))

    # real sample_frames on Y4M: fingerprint = sha256 of the luma plane
    import hashlib

    sf = sample_frames(vids, "data", "doc_id", every_n=5).toPandas()
    one = sf[sf.doc_id == sf.doc_id.max()].iloc[0]
    doc_id, idx = int(one.doc_id), int(one.frame_idx)
    w = 8 + doc_id % 16
    h = 8 + (doc_id * 5) % 16
    col = ((np.arange(h, dtype=np.int64) + doc_id + 3 * idx) % 256).astype(np.uint8)
    plane = np.repeat(col[:, None], w, axis=1)
    assert one.frame_sha256 == hashlib.sha256(plane.tobytes()).hexdigest()


# ------------------------------------------------------------------ #
# Perceptual hash + image near-dup                                    #
# ------------------------------------------------------------------ #


def test_dhash_brightness_invariance_and_sensitivity():
    from krnel_graph_spark.functions.multimodal import _dhash_bits

    img = RNG.randint(0, 200, size=(32, 32)).astype(np.uint8)
    base = _dhash_bits(img)
    # uniform brightness shift preserves every gradient sign
    assert _dhash_bits(np.clip(img.astype(int) + 40, 0, 255).astype(np.uint8)) == base
    # nearest-neighbor upscale hits the same grid cells
    assert _dhash_bits(np.repeat(np.repeat(img, 2, 0), 2, 1)) == base
    # an unrelated image lands far away
    other = RNG.randint(0, 200, size=(32, 32)).astype(np.uint8)
    assert bin(base ^ _dhash_bits(other)).count("1") > 10


def test_image_near_dups_banded(spark):
    from krnel_graph_spark.functions.codecs import encode_png
    from krnel_graph_spark.functions.multimodal import image_dhash, image_near_dups

    rng = np.random.RandomState(5)
    base = rng.randint(0, 200, size=(40, 40)).astype(np.uint8)
    near = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)  # brightness
    blur = base.copy()
    blur[0:3, 0:3] = 0  # tiny local edit
    rows = [
        (0, bytearray(encode_png(base))),
        (1, bytearray(encode_png(near))),
        (2, bytearray(encode_png(blur))),
        (3, bytearray(encode_png(rng.randint(0, 200, size=(40, 40)).astype(np.uint8)))),
        (4, bytearray(encode_png(rng.randint(0, 200, size=(24, 56)).astype(np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")

    # brute-force truth from the hashes themselves
    hashes = {
        r["doc_id"]: r["phash"] & ((1 << 64) - 1)
        for r in image_dhash(df, "data", "doc_id").collect()
    }
    want = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    assert (0, 1) in want  # brightness shift is hash-identical

    got = {
        (r["doc_a"], r["doc_b"])
        for r in image_near_dups(df, "data", "doc_id", max_hamming=3).collect()
    }
    assert got == want
    plan = image_near_dups(df, "data", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_audio_fingerprint_invariance_and_pairs(spark):
    from krnel_graph_spark.functions.codecs import encode_wav
    from krnel_graph_spark.functions.multimodal import (
        _audio_fp_bits,
        audio_fingerprint,
        audio_near_dups,
    )

    rng = np.random.RandomState(11)
    t = np.arange(4000)
    tone = (
        3000 * np.sin(2 * np.pi * 440 * t / 8000)
        + 2000 * np.sin(2 * np.pi * 1200 * t / 8000) * (t > 2000)
    )
    base = tone + 200 * rng.randn(4000)
    # gain change preserves every energy-gradient sign
    assert _audio_fp_bits(base) == _audio_fp_bits(base * 0.5)
    other = 3000 * rng.randn(4000)
    assert bin(_audio_fp_bits(base) ^ _audio_fp_bits(other)).count("1") > 8

    rows = [
        (0, bytearray(encode_wav(base.astype(np.int16)))),
        (1, bytearray(encode_wav((base * 0.7).astype(np.int16)))),
        (2, bytearray(encode_wav(other.astype(np.int16)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    fps = {
        r["doc_id"]: r["afp"] & ((1 << 64) - 1)
        for r in audio_fingerprint(df, "data", "doc_id").collect()
    }
    want = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert (0, 1) in want
    got = {
        (r["doc_a"], r["doc_b"])
        for r in audio_near_dups(df, "data", "doc_id", max_hamming=3).collect()
    }
    assert got == want


def test_video_near_dups(spark):
    from krnel_graph_spark.functions.codecs import encode_y4m
    from krnel_graph_spark.functions.multimodal import video_near_dups

    rng = np.random.RandomState(21)
    base = rng.randint(0, 256, size=(12, 8, 8)).astype(np.uint8)
    extended = np.concatenate([base, rng.randint(0, 256, size=(2, 8, 8)).astype(np.uint8)])
    other = rng.randint(0, 256, size=(12, 8, 8)).astype(np.uint8)
    rows = [
        (0, bytearray(encode_y4m(base))),
        (1, bytearray(encode_y4m(extended))),   # 12/14 shared frames
        (2, bytearray(encode_y4m(other))),
        (3, bytearray(encode_y4m(base[::-1].copy()))),  # same SET, reordered
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in video_near_dups(df, "data", "doc_id", jaccard_threshold=0.5).collect()
    }
    # (0,1): 12 shared of 14 union; (0,3)/(1,3): order-insensitive set match
    assert got[(0, 1)] == round(12 / 14, 6)
    assert got[(0, 3)] == 1.0
    assert got[(1, 3)] == round(12 / 14, 6)
    assert not any(2 in pair for pair in got)

    plan = video_near_dups(df, "data", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
