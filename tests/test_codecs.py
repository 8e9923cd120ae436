"""Stdlib media codecs: PNG/WAV round trips across every filter type and
pixel layout, resize math, error contracts, and a cross-implementation
interop check against the JVM's ImageIO (so 'round trip' can't mean
'two halves of the same bug')."""

import numpy as np
import pytest

from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (
    png_decode,
    png_encode,
    resize_nearest,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("shape", [(5, 7), (4, 6, 3), (3, 3, 2), (8, 2, 4), (1, 1), (16, 16, 3)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(shape, filter_type):
    rng = np.random.default_rng(42)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(a, filter_type=filter_type))
    expect = a if a.ndim == 3 else a[:, :, None]
    assert np.array_equal(out, expect)


def test_png_encode_deterministic():
    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert png_encode(a) == png_encode(a.copy())


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF not a png")
    a = np.zeros((2, 2), dtype=np.uint16)
    with pytest.raises(ValueError, match="uint8"):
        png_encode(a)


def test_resize_nearest_exact_indices():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert resize_nearest(a, 2, 2).tolist() == [[0, 2], [8, 10]]
    up = resize_nearest(a, 8, 8)
    assert up.shape == (8, 8)
    assert up[0, 0] == 0 and up[7, 7] == 15


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    s = (rng.standard_normal(500) * 12000).astype(np.int16)
    d, rate = wav_decode(wav_encode(s, 8000))
    assert rate == 8000
    assert np.array_equal(d[:, 0], s)
    st = np.stack([s, -s], axis=1)
    d2, rate2 = wav_decode(wav_encode(st, 44100))
    assert rate2 == 44100
    assert np.array_equal(d2, st)


def test_png_interop_with_jvm_imageio(spark):
    """Cross-implementation check via the JVM's javax.imageio:
    (a) an ImageIO-encoded PNG (a fully independent encoder) decodes to
    the source pixels with our decoder; (b) our encoder's output parses
    in ImageIO back to the same pixels — proving standards compliance,
    not mutual-bug symmetry."""
    jvm = spark.sparkContext._jvm
    rng = np.random.default_rng(11)
    h, w = 6, 9
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    # (a) encode with ImageIO, decode with ours
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    theirs = bytes(baos.toByteArray())
    ours_decoded = png_decode(theirs)
    assert np.array_equal(ours_decoded, px)

    # (b) encode with ours, decode with ImageIO
    data = png_encode(px)
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img2 = jvm.javax.imageio.ImageIO.read(bais)
    assert img2.getWidth() == w and img2.getHeight() == h
    for y in range(h):
        for x in range(w):
            rgb = img2.getRGB(x, y) & 0xFFFFFF
            r, g, b = rgb >> 16, (rgb >> 8) & 0xFF, rgb & 0xFF
            assert (r, g, b) == tuple(int(v) for v in px[y, x])


def test_resize_image_bytes_roundtrip():
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import decode_image, resize_image

    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = resize_image(png_encode(a), 4, 4)
    out = decode_image(small)
    assert out.shape == (4, 4, 1)
    assert np.array_equal(out[:, :, 0], resize_nearest(a, 4, 4))
