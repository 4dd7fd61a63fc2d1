"""Codec + corpus invariants (input_hint: decoded-pixel allclose, PSNR ≥ 40 dB
for lossy, caption byte-equality)."""

from __future__ import annotations

import numpy as np
import pytest

from roddy_spark.sources import codecs
from roddy_spark.sources.corpus import gen_caption, gen_pixels, gen_row


def _rand_img(seed, h=33, w=47):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    for seed in range(5):
        img = _rand_img(seed)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


def test_png_decode_handles_filters():
    # zlib-compressed stream with per-row filters 0..4 applied manually
    import struct
    import zlib
    img = _rand_img(7, h=5, w=4)
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3).astype(np.int32)
    rows = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y].copy()
        prior = flat[y - 1] if y else np.zeros(w * 3, np.int32)
        px = cur.reshape(w, 3)
        pr = prior.reshape(w, 3)
        if f == 1:
            enc = px.copy()
            enc[1:] = (px[1:] - px[:-1]) % 256
        elif f == 2:
            enc = (px - pr) % 256
        elif f == 3:
            left = np.vstack([np.zeros(3, np.int32), px[:-1]])
            enc = (px - ((left + pr) >> 1)) % 256
        elif f == 4:
            enc = px.copy()
            for x in range(w):
                a = px[x - 1] if x else np.zeros(3, np.int32)
                c = pr[x - 1] if x else np.zeros(3, np.int32)
                pa = codecs._paeth(a.astype(np.uint8),
                                   pr[x].astype(np.uint8),
                                   c.astype(np.uint8)).astype(np.int32)
                enc[x] = (px[x] - pa) % 256
        else:
            enc = px
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + codecs._chunk(b"IEND", b""))
    assert np.array_equal(codecs.decode_png(data), img)


def test_lossy_roundtrip_psnr():
    for seed in range(5):
        img = _rand_img(seed)
        dec = codecs.decode_lossy(codecs.encode_lossy(img))
        assert dec.shape == img.shape
        p = codecs.psnr(img, dec)
        assert p >= 40.0, f"lossy PSNR {p} < 40 dB"
        assert not np.array_equal(dec, img)  # genuinely lossy


def test_psnr_identity_inf():
    img = _rand_img(1)
    assert codecs.psnr(img, img) == float("inf")


def test_phash_properties():
    img = _rand_img(3, h=48, w=48)
    h1 = codecs.phash64(img)
    assert -(1 << 63) <= h1 < (1 << 63)
    # lossy re-encode barely moves the hash; unrelated image is far
    dec = codecs.decode_lossy(codecs.encode_lossy(img))
    assert codecs.hamming64(h1, codecs.phash64(dec)) <= 4
    other = _rand_img(999, h=48, w=48)
    assert codecs.hamming64(h1, codecs.phash64(other)) > 10


@pytest.mark.parametrize("i", [0, 1, 2, 17])
def test_corpus_row_invariants(i):
    row = gen_row(42, i)
    pixels = gen_pixels(42, i)
    assert row["caption"] == gen_caption(42, i)  # caption byte-equality
    dec = codecs.decode_image(row["bytes"])
    assert dec.shape == (row["h"], row["w"], 3)
    if row["fmt"] == "png":
        assert np.array_equal(dec, pixels)
    else:
        assert codecs.psnr(pixels, dec) >= 40.0
    assert row["phash"] == codecs.phash64(dec)


def test_corpus_df_distributed(spark):
    from roddy_spark.sources.corpus import corpus_df
    df = corpus_df(spark, 32, seed=42, partitions=4)
    rows = {r["image_id"]: r for r in df.collect()}
    assert len(rows) == 32
    # distributed generation == driver-side pure function
    r7 = gen_row(42, 7)
    assert bytes(rows["img00000007"]["bytes"]) == r7["bytes"]
    assert rows["img00000007"]["phash"] == r7["phash"]
    assert rows["img00000007"]["caption"] == r7["caption"]
