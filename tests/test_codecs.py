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


# ---------------------------------------------------------------------------
# Baseline JPEG
# ---------------------------------------------------------------------------

from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (  # noqa: E402
    jpeg_decode,
    jpeg_encode,
)


def _tile_image(vals, tile=8):
    """2×2 grid of constant 8×8 tiles — the JPEG-exact fixture pattern."""
    a = np.zeros((2 * tile, 2 * tile), dtype=np.uint8)
    for t, (ty, tx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        a[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile] = vals[t]
    return a


def test_jpeg_constant_tiles_roundtrip_exact():
    """Constant 8×8 blocks with EVEN values are bit-exact through
    quality-50 baseline JPEG: DC = 8·(v−128) is divisible by the base
    luminance quantizer q00=16, and every AC coefficient is exactly
    zero — the mathematical basis of the multimodal_features JPEG
    oracle."""
    img = _tile_image([40, 202, 128, 254])
    out = jpeg_decode(jpeg_encode(img, quality=50))
    assert out.shape == (16, 16, 1)
    assert np.array_equal(out[:, :, 0], img)


@pytest.mark.parametrize("quality,bound", [(95, 10), (75, 25)])
def test_jpeg_gray_roundtrip_bounded(quality, bound):
    """Lossy path: smooth gradients reconstruct within a quality-
    dependent error bound (exercises DC prediction, AC run-lengths,
    ZRL, EOB, multi-MCU scans, non-multiple-of-8 dims)."""
    yy, xx = np.mgrid[0:21, 0:35]
    img = ((yy * 4 + xx * 3) % 200 + 20).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=quality))
    assert out.shape == (21, 35, 1)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= bound, f"max pixel error {err} > {bound} at q{quality}"


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_jpeg_color_roundtrip_bounded(subsampling):
    yy, xx = np.mgrid[0:17, 0:23]
    img = np.zeros((17, 23, 3), dtype=np.uint8)
    img[:, :, 0] = (yy * 5 + 30) % 200
    img[:, :, 1] = (xx * 4 + 50) % 200
    img[:, :, 2] = 90
    out = jpeg_decode(jpeg_encode(img, quality=95, subsampling=subsampling))
    assert out.shape == (17, 23, 3)
    err = np.abs(out.astype(int) - img.astype(int)).max()
    bound = 6 if subsampling == "4:4:4" else 14  # chroma halving costs accuracy
    assert err <= bound, f"{subsampling}: max error {err} > {bound}"


def test_jpeg_encode_deterministic():
    img = _tile_image([10, 20, 30, 40])
    assert jpeg_encode(img) == jpeg_encode(img.copy())


def test_jpeg_rejects_garbage_and_out_of_scope():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError, match="uint8"):
        jpeg_encode(np.zeros((8, 8), dtype=np.float64))
    with pytest.raises(ValueError, match="quality"):
        jpeg_encode(np.zeros((8, 8), dtype=np.uint8), quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="4:1:1")
    # arithmetic-coded SOF marker is detected and named, not mis-decoded
    data = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 1] = 0xC9  # rewrite SOF0 → SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="arithmetic"):
        jpeg_decode(bytes(data))
    # a SEQUENTIAL stream relabeled SOF2 carries Se=63 in its (one) scan
    # header — an illegal progressive DC scan, caught rather than
    # silently mis-decoded as progressive
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(bytes(data))


def test_jpeg_interop_with_jvm_imageio(spark):
    """Cross-implementation check via the JVM's javax.imageio — the same
    independence argument as the PNG interop test. JPEG is lossy, so the
    contract is bounded error, not equality; the constant-tile fixture
    additionally survives the OTHER implementation's encoder within ±1
    (its integer DCT may round DC differently)."""
    jvm = spark.sparkContext._jvm
    px = _tile_image([40, 202, 128, 254])
    h, w = px.shape

    # (a) encode with ImageIO, decode with ours
    img = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, int(px[y, x]))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    theirs = bytes(baos.toByteArray())
    ours_decoded = jpeg_decode(theirs)
    assert ours_decoded.shape == (h, w, 1)
    err_a = np.abs(ours_decoded[:, :, 0].astype(int) - px.astype(int)).max()
    assert err_a <= 4, f"ImageIO-encoded tiles decode with max error {err_a}"

    # (b) encode with ours, decode with ImageIO
    data = jpeg_encode(px, quality=50)
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img2 = jvm.javax.imageio.ImageIO.read(bais)
    assert img2.getWidth() == w and img2.getHeight() == h
    raster2 = img2.getRaster()
    errs = []
    for y in range(h):
        for x in range(w):
            errs.append(abs(raster2.getSample(x, y, 0) - int(px[y, x])))
    assert max(errs) <= 1, f"our JPEG decodes in ImageIO with max error {max(errs)}"


def test_decode_image_routes_jpeg():
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import decode_image

    img = _tile_image([12, 34, 56, 78])
    out = decode_image(jpeg_encode(img, quality=50))
    assert np.array_equal(out[:, :, 0], img)
    with pytest.raises(ValueError, match="PNG or JPEG"):
        decode_image(b"\x00\x01\x02garbage")


def test_bitreader_feeds_zero_bits_at_marker():
    """T.81 F.2.2.5: a real marker encountered mid-entropy-read feeds
    ZERO bits (the marker pad libjpeg implements) instead of raising,
    and leaves pos ON the marker for the caller's EOI/RST handling.
    Spec-legal foreign streams rely on this to complete the final MCU."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import _BitReader

    r = _BitReader(b"\xab\xff\xd9", 0)
    assert r.receive(8) == 0xAB
    assert r.receive(8) == 0x00  # zero-fed past the EOI marker
    assert r.receive(4) == 0x0  # keeps feeding zeros, no crash
    assert r.data[r.pos : r.pos + 2] == b"\xff\xd9"  # pos still on marker


def test_jpeg_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker code. Inject fill bytes before DQT/SOS and assert the decode
    is unchanged."""
    img = _tile_image([40, 202, 128, 254])
    data = jpeg_encode(img, quality=50)
    for seg in (b"\xff\xdb", b"\xff\xda"):  # DQT, SOS
        at = data.find(seg)
        assert at > 0
        padded = data[:at] + b"\xff\xff" + data[at:]
        out = jpeg_decode(padded)
        assert np.array_equal(out[:, :, 0], img), f"fill bytes before {seg!r}"


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2)
# ---------------------------------------------------------------------------


def _imageio_jpeg(jvm, img, progressive: bool, quality: float = 0.75) -> bytes:
    """Encode a BufferedImage via javax.imageio with progressive mode
    toggled — the fully independent encoder for SOF2 streams (the
    stdlib-free container has no Python image lib; the Spark JVM's
    ImageIO is the reference implementation at hand)."""
    ImageIO = jvm.javax.imageio.ImageIO
    writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    if progressive:
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    writer.dispose()
    return bytes(baos.toByteArray())


def _gray_buffered_image(jvm, px):
    h, w = px.shape
    img = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, int(px[y, x]))
    return img


def _rgb_buffered_image(jvm, px):
    h, w, _ = px.shape
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            rgb = (int(px[y, x, 0]) << 16) | (int(px[y, x, 1]) << 8) | int(px[y, x, 2])
            img.setRGB(x, y, rgb)
    return img


def _jvm_decode_gray(jvm, data: bytes) -> np.ndarray:
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(bais)
    h, w = img.getHeight(), img.getWidth()
    raster = img.getRaster()
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            out[y, x] = raster.getSample(x, y, 0)
    return out


def test_progressive_jpeg_gray_matches_jvm_decoder(spark):
    """An ImageIO-encoded PROGRESSIVE (SOF2) gray JPEG decodes here to
    the same pixels the JVM's own decoder produces (±1 IDCT rounding),
    and within the lossy bound of the original — the round-8 closure of
    the one remaining declared multimodal fake."""
    jvm = spark.sparkContext._jvm
    yy, xx = np.mgrid[0:21, 0:35]
    px = ((yy * 4 + xx * 3) % 200 + 20).astype(np.uint8)
    data = _imageio_jpeg(jvm, _gray_buffered_image(jvm, px), progressive=True)
    assert b"\xff\xc2" in data, "ImageIO did not emit SOF2"
    ours = jpeg_decode(data)
    assert ours.shape == (21, 35, 1)
    theirs = _jvm_decode_gray(jvm, data)
    cross = np.abs(ours[:, :, 0].astype(int) - theirs).max()
    assert cross <= 1, f"progressive decode disagrees with ImageIO by {cross}"
    err = np.abs(ours[:, :, 0].astype(int) - px.astype(int)).max()
    assert err <= 30, f"progressive decode error vs original {err}"


def test_progressive_jpeg_color_matches_baseline_decode(spark):
    """The SAME image encoded sequential and progressive by ImageIO
    decodes here to near-identical pixels (the two entropy layouts carry
    the same quantized coefficients at equal quality), and the
    progressive stream really exercises SOF2 + multi-scan parsing."""
    jvm = spark.sparkContext._jvm
    yy, xx = np.mgrid[0:17, 0:23]
    px = np.zeros((17, 23, 3), dtype=np.uint8)
    px[:, :, 0] = (yy * 5 + 30) % 200
    px[:, :, 1] = (xx * 4 + 50) % 200
    px[:, :, 2] = 90
    img = _rgb_buffered_image(jvm, px)
    seq = _imageio_jpeg(jvm, img, progressive=False)
    prog = _imageio_jpeg(jvm, img, progressive=True)
    assert b"\xff\xc2" not in seq and b"\xff\xc2" in prog
    assert prog.count(b"\xff\xda") > 1, "progressive stream should multi-scan"
    out_seq = jpeg_decode(seq).astype(int)
    out_prog = jpeg_decode(prog).astype(int)
    assert out_prog.shape == (17, 23, 3)
    cross = np.abs(out_seq - out_prog).max()
    assert cross <= 2, f"sequential vs progressive decode differ by {cross}"
    err = np.abs(out_prog - px.astype(int)).max()
    assert err <= 40, f"progressive color decode error vs original {err}"


def test_decode_image_routes_progressive_jpeg(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import decode_image

    jvm = spark.sparkContext._jvm
    px = _tile_image([40, 202, 128, 254])
    data = _imageio_jpeg(jvm, _gray_buffered_image(jvm, px), progressive=True)
    assert b"\xff\xc2" in data
    out = decode_image(data)
    assert out.shape == (16, 16, 1)
    assert np.abs(out[:, :, 0].astype(int) - px.astype(int)).max() <= 4


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video container
# ---------------------------------------------------------------------------

from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (  # noqa: E402
    avi_decode_mjpeg,
    avi_encode_mjpeg,
)


def test_avi_mjpeg_roundtrip_bytes_and_meta():
    frames = [
        jpeg_encode(np.full((16, 16), 40 + i * 20, dtype=np.uint8), quality=50)
        for i in range(5)
    ]
    avi = avi_encode_mjpeg(frames, fps=12)
    out, meta = avi_decode_mjpeg(avi)
    assert out == frames  # container framing is lossless
    assert meta == {"fps": 12, "n_frames": 5, "width": 16, "height": 16}
    # every demuxed frame is a standalone decodable JPEG (constant
    # even-valued tiles are bit-exact through quality-50 baseline)
    for i, f in enumerate(out):
        px = jpeg_decode(f)
        assert int(px[0, 0, 0]) == 40 + i * 20


def test_avi_rejects_garbage_and_foreign_codecs():
    with pytest.raises(ValueError, match="RIFF"):
        avi_decode_mjpeg(b"\x89PNG not an avi")
    with pytest.raises(ValueError, match="at least one frame"):
        avi_encode_mjpeg([])
    with pytest.raises(ValueError, match="JPEG"):
        avi_encode_mjpeg([b"not a jpeg"])
    # a JPEG-framed stream with headers but no SOF still names the miss
    with pytest.raises(ValueError, match="SOF"):
        avi_encode_mjpeg([b"\xff\xd8\xff\xfe\x00\x04xx\xff\xd9"])
    # an AVI whose vids stream declares a non-MJPG codec must raise, not
    # hand back inter-frame garbage as 'frames'
    frames = [jpeg_encode(np.zeros((8, 8), dtype=np.uint8), quality=50)]
    avi = bytearray(avi_encode_mjpeg(frames))
    at = bytes(avi).find(b"vidsMJPG")
    avi[at + 4 : at + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPG"):
        avi_decode_mjpeg(bytes(avi))


def test_frame_sample_demuxes_mjpeg_avi(spark, tmp_path):
    """The video branch of frame_sample is REAL now: an MJPEG AVI blob
    yields n standalone JPEG frames sampled evenly across the clip."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import frame_sample, read_binary_dir

    frames = [
        jpeg_encode(np.full((8, 8), 40 + i * 20, dtype=np.uint8), quality=50)
        for i in range(8)
    ]
    (tmp_path / "clip.avi").write_bytes(avi_encode_mjpeg(frames, fps=4))
    df = read_binary_dir(spark, str(tmp_path), "*.avi")
    assert df.select("media.mime").first()[0] == "video/x-msvideo"
    out = frame_sample(df, n_frames=4).orderBy("frame_idx").collect()
    assert len(out) == 4
    # evenly spaced: frames 0, 2, 4, 6 of the 8-frame clip
    for row, src_idx in zip(out, (0, 2, 4, 6)):
        px = jpeg_decode(bytes(row.frame_bytes))
        assert int(px[0, 0, 0]) == 40 + src_idx * 20


from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (  # noqa: E402
    jpeg_encode_progressive,
)


def test_progressive_encoder_tiles_bit_exact_and_coeff_identical():
    """The two-scan SOF2 encoder (Al=0) carries the SAME quantized
    coefficients as baseline — constant even tiles stay bit-exact (the
    multimodal oracle's progressive leg), and arbitrary images decode
    IDENTICALLY through both entropy layouts."""
    img = _tile_image([40, 202, 128, 254])
    prog = jpeg_encode_progressive(img, quality=50)
    assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") == 2
    out = jpeg_decode(prog)
    assert np.array_equal(out[:, :, 0], img)

    yy, xx = np.mgrid[0:21, 0:35]
    grad = ((yy * 4 + xx * 3) % 200 + 20).astype(np.uint8)
    via_prog = jpeg_decode(jpeg_encode_progressive(grad, quality=95))
    via_base = jpeg_decode(jpeg_encode(grad, quality=95))
    assert np.array_equal(via_prog, via_base)

    with pytest.raises(ValueError, match="grayscale"):
        jpeg_encode_progressive(np.zeros((8, 8, 3), dtype=np.uint8))


def test_progressive_encoder_interop_with_jvm_imageio(spark):
    """Our SOF2 stream parses in the JVM's ImageIO back to the fixture
    pixels — the independent-decoder direction for the encoder."""
    jvm = spark.sparkContext._jvm
    px = _tile_image([40, 202, 128, 254])
    data = jpeg_encode_progressive(px, quality=50)
    theirs = _jvm_decode_gray(jvm, data)
    assert np.abs(theirs - px.astype(int)).max() <= 1


def test_progressive_headers_only_raises():
    """Regression (round 8 review): an SOF2 stream with ZERO SOS scans
    must raise like its sequential twin — assembling the all-zero
    coefficient accumulators would fabricate a plausible solid-gray
    image from a truncated/malformed file."""
    img = np.full((16, 16), 128, dtype=np.uint8)
    data = jpeg_encode_progressive(img, quality=50)
    at = data.find(b"\xff\xda")
    assert at > 0
    headers_only = data[:at] + b"\xff\xd9"
    with pytest.raises(ValueError, match="missing SOS"):
        jpeg_decode(headers_only)


def test_avi_header_dims_skip_exif_thumbnail_sof():
    """Regression (round 8 review): frame dimensions must come from the
    frame's real SOF via a marker-segment walk — a raw FF C0 byte search
    hits the SOF of a complete thumbnail JPEG embedded in an EXIF APP1
    segment first, recording 8x8 instead of the true frame size."""
    import struct as _struct

    main = jpeg_encode(np.zeros((32, 24), dtype=np.uint8), quality=50)
    thumb = jpeg_encode(np.zeros((8, 8), dtype=np.uint8), quality=50)
    payload = b"Exif\x00\x00" + thumb
    app1 = b"\xff\xe1" + _struct.pack(">H", len(payload) + 2) + payload
    frame = main[:2] + app1 + main[2:]
    assert frame.find(b"\xff\xc0") < frame.rfind(b"\xff\xc0")  # trap armed
    avi = avi_encode_mjpeg([frame])
    out, meta = avi_decode_mjpeg(avi)
    assert (meta["width"], meta["height"]) == (24, 32)
    assert out == [frame]


# ---------------------------------------------------------------------------
# Round 9: MPEG-1 I-frame codec (ISO 11172-2)

from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (  # noqa: E402
    _MPEG_INTRA_QUANT,
    _MpegBitReader,
    _MpegBitWriter,
    _mpeg_decode_block,
    _mpeg_write_ac,
    _mpeg_write_dc,
    _MPEG_DC_LUM,
    mpeg1_decode_iframes,
    mpeg1_encode_iframes,
)


def test_mpeg1_flat_frames_roundtrip_exact():
    """Intra DC coding of a flat block is exact at EVERY 0-255 value
    (no JPEG even-constant constraint: MPEG-1 carries DC at x8 scale
    with no level shift), and gray maps to R=G=B bit-for-bit."""
    vals = [0, 1, 7, 127, 128, 200, 254, 255]
    frames = [np.full((16, 32), v, dtype=np.uint8) for v in vals]
    out, meta = mpeg1_decode_iframes(mpeg1_encode_iframes(frames, fps=30))
    assert meta["width"] == 32 and meta["height"] == 16
    assert meta["fps"] == 30.0 and meta["n_iframes"] == len(vals)
    for v, o in zip(vals, out):
        assert o.shape == (16, 32, 3)
        assert (o == v).all(), (v, np.unique(o))


def test_mpeg1_lossy_roundtrip_bounded_and_deterministic():
    """Block-color frames survive the full FDCT/quant/VLC/IDCT path
    within quantization error; encode is byte-deterministic; non-16
    multiples pad and crop correctly."""
    rng = np.random.default_rng(7)
    fr = np.zeros((20, 36, 3), dtype=np.uint8)
    for i in range(0, 20, 4):
        for j in range(0, 36, 4):
            fr[i : i + 4, j : j + 4] = rng.integers(0, 256, 3)
    data = mpeg1_encode_iframes([fr], qscale=2)
    assert data == mpeg1_encode_iframes([fr], qscale=2)
    out, meta = mpeg1_decode_iframes(data)
    assert out[0].shape == (20, 36, 3)
    err = np.abs(out[0].astype(int) - fr.astype(int))
    assert err.max() <= 24, err.max()  # quant + 4:2:0 chroma edges
    assert err.mean() <= 4.0, err.mean()


def test_mpeg1_block_vlc_table_and_escape_paths():
    """Direct block round trip through the AC VLC layer: table-coded
    short entries, 8-bit escapes, and BOTH extended escape forms
    (128..255 / -255..-128), verified against the spec reconstruction
    (truncating division + oddification) computed independently."""
    cases = [  # (run, level) pairs spanning every encode path
        (0, 1), (3, 1), (0, 4), (15, 1), (5, 2),        # table subset
        (0, -3), (7, -1),                               # table + sign
        (0, 40), (20, 13), (63 - 1 - 21, -77),          # 8-bit escapes
        (2, 200), (0, 255),                             # extended +
        (1, -128), (4, -255),                           # extended −
    ]
    qscale = 3
    for run, level in cases:
        w = _MpegBitWriter()
        _mpeg_write_dc(w, 10, _MPEG_DC_LUM)  # dc diff +10 over pred 128
        _mpeg_write_ac(w, run, level)
        w.write(0b10, 2)  # EOB
        r = _MpegBitReader(w.bytes())
        px, dc = _mpeg_decode_block(r, True, 128, qscale, _MPEG_INTRA_QUANT)
        assert dc == 138
        # independent spec reconstruction of the single AC coefficient
        zz = np.zeros(64, dtype=np.int64)
        zz[1 + run] = level
        recon = np.zeros(64, dtype=np.int64)
        from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import _DCT_C, _ZIGZAG

        recon[_ZIGZAG] = zz
        prod = 2 * recon * qscale * _MPEG_INTRA_QUANT
        vals = np.sign(prod) * (np.abs(prod) // 16)
        vals = vals - ((vals % 2 == 0) & (vals != 0)) * np.sign(vals)
        vals[0] = 138 * 8
        expect = _DCT_C.T @ vals.reshape(8, 8).astype(float) @ _DCT_C
        assert np.allclose(px, expect), (run, level)


def test_mpeg1_skips_non_i_pictures():
    """P/B pictures (and their slices) are structurally skipped: the
    decoder returns only I-frames and counts both."""
    frames = [np.full((16, 16), v, dtype=np.uint8) for v in (50, 90)]
    data = bytearray(mpeg1_encode_iframes(frames))
    end = data.rfind(b"\x00\x00\x01\xb7")
    second_pic = data.rfind(b"\x00\x00\x01\x00", 0, end)
    # splice a P picture (type 2) with one garbage slice between the two
    w = _MpegBitWriter()
    w.write(0x00000100, 32)
    w.write(1, 10)
    w.write(2, 3)        # P
    w.write(0xFFFF, 16)
    w.write(1, 1)        # full_pel_forward_vector
    w.write(1, 3)        # forward_f_code
    w.write(0, 1)
    fake = w.bytes() + b"\x00\x00\x01\x05" + b"\xfa\xce\xfa\xce" + b"\x00\x00"
    spliced = bytes(data[:second_pic]) + fake + bytes(data[second_pic:])
    out, meta = mpeg1_decode_iframes(spliced)
    assert meta["n_pictures"] == 3 and meta["n_iframes"] == 2
    assert len(out) == 2
    assert (out[0] == 50).all() and (out[1] == 90).all()


def test_mpeg1_rejects_garbage():
    with pytest.raises(ValueError, match="sequence header"):
        mpeg1_decode_iframes(b"\x00\x00\x01\xb8" + b"\x00" * 64)
    with pytest.raises(ValueError):
        mpeg1_encode_iframes([])
    with pytest.raises(ValueError, match="qscale"):
        mpeg1_encode_iframes([np.zeros((16, 16), np.uint8)], qscale=0)


def test_frame_sample_decodes_mpeg_keyframes(spark):
    """End-to-end: a video/mpeg media column keyframe-samples through
    frame_sample into standalone PNGs with the right source frames."""
    import pandas as pd

    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import decode_image, frame_sample
    from pyspark.sql.types import StructField, StructType
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import MULTIMODAL_SCHEMA

    frames = [np.full((16, 16), 10 * f, dtype=np.uint8) for f in range(8)]
    blob = mpeg1_encode_iframes(frames)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media": [{"mime": "video/mpeg", "uri": "m://1", "bytes": blob}]}
        ),
        StructType([StructField("media", MULTIMODAL_SCHEMA)]),
    )
    got = frame_sample(df, n_frames=4).collect()
    assert [r["frame_idx"] for r in got] == [0, 1, 2, 3]
    for r in got:
        px = decode_image(bytes(r["frame_bytes"]))
        assert (px == 10 * (r["frame_idx"] * 2)).all()


def test_mpeg1_vlc_tables_are_prefix_free():
    """No external MPEG decoder exists in this sandbox to cross-check
    the transcribed VLC tables against, so verify their STRUCTURE
    instead: within each table (plus the fixed codes sharing its space)
    no code may be a prefix of another, or decode would be ambiguous —
    the failure mode of a transcription slip."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (
        _MPEG_AC_LONG,
        _MPEG_AC_SHORT,
        _MPEG_DC_CHROM,
        _MPEG_DC_LUM,
        _MPEG_MBA,
        _MPEG_MBA_ESCAPE,
        _MPEG_MBA_STUFF,
    )

    def assert_prefix_free(codes, what):
        codes = sorted(codes)
        assert len(codes) == len(set(codes)), f"duplicate code in {what}"
        for a, b in zip(codes, codes[1:]):
            assert not b.startswith(a), f"{what}: {a!r} prefixes {b!r}"

    # AC coefficient space: EOB '10', (0,1) '11', escape '000001', and
    # every run/level entry (sign bit follows, so the prefix property
    # must hold on the unsigned part against ALL other unsigned parts)
    ac = {**_MPEG_AC_SHORT, **_MPEG_AC_LONG}
    assert len(ac) == len(_MPEG_AC_SHORT) + len(_MPEG_AC_LONG)  # no dup keys
    assert_prefix_free(list(ac.values()) + ["10", "000001"], "dct_coeff")
    # every (run, level) appears exactly once across both tables
    assert len(set(ac.values())) == len(ac)

    # macroblock address space incl. escape + stuffing
    assert_prefix_free(
        list(_MPEG_MBA.values()) + [_MPEG_MBA_ESCAPE, _MPEG_MBA_STUFF],
        "macroblock_address",
    )

    # DC size tables
    for tbl, what in ((_MPEG_DC_LUM, "dc_lum"), (_MPEG_DC_CHROM, "dc_chrom")):
        assert_prefix_free(
            [format(code, f"0{n}b") for code, n in tbl.values()], what
        )


def test_mpeg1_long_tail_vlc_decode_fixture():
    """Round 10: the 12-16-bit B.5c entries gain DECODE coverage. The
    encoder never emits them (it escapes), so a hand-assembled
    elementary stream codes the same (run, level) sequence TWICE — once
    through the long-tail table entries, once through the (round-trip-
    verified) 6-bit ESCAPE form — and both must decode to identical
    pixels: a mistranscribed long-tail entry that still parses would
    reconstruct a different coefficient and split the two frames; an
    invalid prefix raises. The chosen pairs span every long-tail code
    length (12..16 bits) and both signs."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (
        _MPEG_AC_LONG,
        _MPEG_DC_CHROM,
        _MPEG_MBA,
    )

    # per-block (run, level) sequences; every |pair| is long-tail-only
    block_pairs = [
        [(0, 8), (1, 5), (27, 1)],          # 12 + 12 + 16 bit
        [(0, -12), (2, 5), (31, -1)],       # 13 + 13 + 16
        [(0, 16), (1, -6), (16, 2)],        # 14 + 13 + 16
        [(0, -32), (1, 8)],                 # 15 + 15
        [(0, 40), (6, -3)],                 # 15 + 16
        [(0, 21), (0, -27), (14, 2)],       # 14 + 14 + 16
    ]
    used_lengths = set()
    for pairs in block_pairs:
        for run, level in pairs:
            bits = _MPEG_AC_LONG[(run, abs(level))]
            assert 12 <= len(bits) <= 16
            used_lengths.add(len(bits))
    assert used_lengths == {12, 13, 14, 15, 16}
    # run/level walks stay inside the 63 AC positions
    for pairs in block_pairs:
        k = 0
        for run, _ in pairs:
            k += run + 1
        assert k <= 63

    def write_long(w, run, level):
        w.write_bits(_MPEG_AC_LONG[(run, abs(level))])
        w.write(0 if level > 0 else 1, 1)

    def write_escape(w, run, level):
        _mpeg_write_ac(w, run, level)  # long pairs are not in the short
        # table, so this takes the escape form by construction

    def assemble(ac_writer):
        w = _MpegBitWriter()
        w.write(0x000001B3, 32)          # sequence header, 16x16 @ 25fps
        w.write(16, 12)
        w.write(16, 12)
        w.write(1, 4)
        w.write(3, 4)
        w.write(0x3FFFF, 18)
        w.write(1, 1)
        w.write(16, 10)
        w.write(0, 3)                    # constrained + 2 load flags
        w.align()
        w.write(0x00000100, 32)          # picture: I
        w.write(0, 10)
        w.write(1, 3)
        w.write(0xFFFF, 16)
        w.write(0, 1)
        w.align()
        w.write(0x00000101, 32)          # slice 1
        w.write(2, 5)                    # quantizer_scale = 2
        w.write(0, 1)
        w.write_bits(_MPEG_MBA[1])       # one macroblock
        w.write(1, 1)                    # macroblock_type: intra-d
        for i, pairs in enumerate(block_pairs):
            lum = i < 4
            _mpeg_write_dc(w, 0, _MPEG_DC_LUM if lum else _MPEG_DC_CHROM)
            for run, level in pairs:
                ac_writer(w, run, level)
            w.write(0b10, 2)             # EOB
        w.align()
        w.write(0x000001B7, 32)
        return w.bytes()

    frames_long, meta_long = mpeg1_decode_iframes(assemble(write_long))
    frames_esc, meta_esc = mpeg1_decode_iframes(assemble(write_escape))
    assert meta_long["n_iframes"] == meta_esc["n_iframes"] == 1
    assert len(frames_long) == len(frames_esc) == 1
    assert frames_long[0].shape == (16, 16, 3)
    assert np.array_equal(frames_long[0], frames_esc[0])
    # the coefficients did real work: the frame is not the flat DC-only
    # block a dropped coefficient would produce
    assert frames_long[0].std() > 1.0
