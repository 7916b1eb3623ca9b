"""Multimodal binary-column plumbing (schema, Arrow batching, mapInPandas)."""

import pytest
from pyspark.sql import functions as F

from ftm_columnstore_spark.operators.multimodal import (
    attach_meta,
    extract_features,
    filter_by_mime,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(10)) * (i + 2)) for i in range(6)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    return attach_meta(df, mime="image/png").cache()


def test_attach_meta(media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert row["meta"]["mime"] == "image/png"
    assert row["meta"]["duration_ms"] == 20


def test_filter_by_mime_prunes_payload(media):
    assert filter_by_mime(media, "image/").count() == 6
    assert filter_by_mime(media, "audio/").count() == 0


def test_extract_features_fake(media):
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 6
    assert all(len(r["features"]) == 16 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["features"])
    # deterministic: same payload → same features
    again = extract_features(media, fake=True).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in again
    }


def test_extract_features_without_codec_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_features(media, fake=False).collect()


def test_sample_frames_fake(media):
    frames = sample_frames(media, n_frames=4, fake=True).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == set(range(6))
    assert all(len(v) == 4 for v in by_id.values())
    assert all(isinstance(bytes(r["frame"]), bytes) for r in frames)


def test_resize_images_fake(media):
    from ftm_columnstore_spark.operators.multimodal import resize_images

    out = resize_images(media, 32, 32, fake=True)
    rows = out.collect()
    assert len(rows) == 6
    assert all(len(bytes(r["payload"])) == 32 * 32 for r in rows)
    assert all(
        r["meta"]["width"] == 32 and r["meta"]["height"] == 32 for r in rows
    )
    # mime survives the resize
    assert all(r["meta"]["mime"].startswith("image/") for r in rows)
    # deterministic + composable: resized media feeds extract_features
    feats = extract_features(out, fake=True).collect()
    assert len(feats) == 6


def test_image_ahash_matches_manual_bits(spark):
    import numpy as np

    from ftm_columnstore_spark.operators.codecs import encode_bmp
    from ftm_columnstore_spark.operators.multimodal import image_ahash

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_bmp(img)))], "media_id long, payload binary"
    )
    got = image_ahash(media).collect()[0]["ahash"]
    cells = img.astype(np.int64).sum(axis=-1)
    total = int(cells.sum())
    expected = 0
    for i, v in enumerate(cells.flatten()):
        if int(v) * 64 > total:
            expected |= 1 << i
    if expected >= 1 << 63:
        expected -= 1 << 64
    assert got == expected


def test_image_dup_pairs_finds_near_duplicates(spark):
    import numpy as np

    from ftm_columnstore_spark.operators.codecs import encode_bmp
    from ftm_columnstore_spark.operators.multimodal import image_dup_pairs

    rng = np.random.RandomState(9)
    base = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]          # one-pixel edit
    far = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(base))),
            (2, bytearray(encode_bmp(near))),
            (3, bytearray(encode_bmp(far))),
        ],
        "media_id long, payload binary",
    )
    pairs = {
        (r["left_id"], r["right_id"]): r["hamming"]
        for r in image_dup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_audio_ahash_matches_manual_bits(spark):
    import numpy as np

    from ftm_columnstore_spark.operators.codecs import encode_wav
    from ftm_columnstore_spark.operators.multimodal import audio_ahash

    rng = np.random.RandomState(3)
    pcm = rng.randint(-1024, 1024, size=128).astype(np.int64)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(pcm, 8000)))], "media_id long, payload binary"
    )
    got = audio_ahash(media).collect()[0]["ahash"]
    a = np.abs(pcm)
    es = [int(a[(i * 128) // 64 : ((i + 1) * 128) // 64].sum()) for i in range(64)]
    tot = sum(es)
    expected = 0
    for i, e in enumerate(es):
        if e * 64 > tot:
            expected |= 1 << i
    if expected >= 1 << 63:
        expected -= 1 << 64
    assert got == expected


def test_audio_dup_pairs_finds_near_duplicates(spark):
    import numpy as np

    from ftm_columnstore_spark.operators.codecs import encode_wav
    from ftm_columnstore_spark.operators.multimodal import audio_dup_pairs

    rng = np.random.RandomState(4)
    base = rng.randint(-1024, 1024, size=256).astype(np.int64)
    near = base.copy()
    near[10] = -near[10]            # |sample| unchanged in one spot? flip another way
    near[11] = near[11] // 2        # small energy edit in one frame
    far = rng.randint(-1024, 1024, size=256).astype(np.int64)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(base, 8000))),
            (2, bytearray(encode_wav(near, 8000))),
            (3, bytearray(encode_wav(far, 8000))),
        ],
        "media_id long, payload binary",
    )
    pairs = {
        (r["left_id"], r["right_id"]): r["hamming"]
        for r in audio_dup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_image_ahash_fuzz_replay(spark):
    """Random images: the operator hash equals the manual bit replay
    for every one (exact-integer contract)."""
    import numpy as np

    from ftm_columnstore_spark.operators.codecs import encode_bmp
    from ftm_columnstore_spark.operators.multimodal import image_ahash

    rng = np.random.RandomState(77)
    imgs = [
        rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(8, 8), (16, 16), (12, 20), (9, 7)]
    ]
    media = spark.createDataFrame(
        [(i, bytearray(encode_bmp(im))) for i, im in enumerate(imgs)],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        cells = im[np.ix_(ys, xs)].astype(np.int64).sum(axis=-1)
        total = int(cells.sum())
        exp = 0
        for j, v in enumerate(cells.flatten()):
            if int(v) * 64 > total:
                exp |= 1 << j
        if exp >= 1 << 63:
            exp -= 1 << 64
        assert got[i] == exp, i


def test_audio_ahash_odd_lengths(spark):
    """Non-divisible sample counts: integer frame bounds still cover
    every sample exactly once (replay equality)."""
    import numpy as np

    from ftm_columnstore_spark.operators.codecs import encode_wav
    from ftm_columnstore_spark.operators.multimodal import audio_ahash

    rng = np.random.RandomState(21)
    for n in (64, 65, 100, 127, 130):
        pcm = rng.randint(-500, 500, size=n).astype(np.int64)
        media = spark.createDataFrame(
            [(1, bytearray(encode_wav(pcm, 8000)))],
            "media_id long, payload binary",
        )
        got = audio_ahash(media).collect()[0]["ahash"]
        a = np.abs(pcm)
        es = [
            int(a[(i * n) // 64 : ((i + 1) * n) // 64].sum())
            for i in range(64)
        ]
        tot = sum(es)
        exp = 0
        for i, e in enumerate(es):
            if e * 64 > tot:
                exp |= 1 << i
        if exp >= 1 << 63:
            exp -= 1 << 64
        assert got == exp, n
