"""Third-party interchange for the real codecs: OpenJDK's ImageIO
(javax.imageio, reached through the Spark JVM gateway — decoders that
share ZERO code with ours) must reconstruct our encoders' files.

- GIF and PNG are lossless: ImageIO's pixels must match EXACTLY.
- JPEG's IDCT is implementation-defined (T.81 bounds accuracy rather
  than mandating an implementation), so ImageIO must match our
  fixed-point reconstruction within +-1 — and exactly on constant
  blocks, where every conforming IDCT lands on the same value.

Gotcha encoded here so nobody reintroduces it: BufferedImage.getRGB
treats grayscale as LINEAR gray and gamma-encodes to sRGB (128 ->
188); raster.getSamples returns the raw sample values the decoder
produced — always compare against the raster.
"""

from __future__ import annotations

import numpy as np
import pytest


def _imageio_gray(spark, path: str) -> np.ndarray:
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    if img is None:
        pytest.fail(f"ImageIO could not decode {path}")
    w, h = img.getWidth(), img.getHeight()
    return np.array(
        img.getRaster().getSamples(0, 0, w, h, 0, None), dtype=np.int64
    )


def _imageio_rgb(spark, path: str) -> np.ndarray:
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    if img is None:
        pytest.fail(f"ImageIO could not decode {path}")
    w, h = img.getWidth(), img.getHeight()
    a = np.array(img.getRGB(0, 0, w, h, None, 0, w), dtype=np.int64)
    return np.stack([(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF], axis=1)


def test_gif_interchange_with_openjdk(spark, tmp_path):
    from ds_mapreduce_spark.operators.gif import (
        GIF_PAL_B_OFF,
        GIF_PAL_G_OFF,
        encode_gif_bytes,
    )

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, 80 * 60).astype(np.uint8)
    p = str(tmp_path / "ours.gif")
    with open(p, "wb") as f:
        f.write(encode_gif_bytes(px.tobytes(), 80, 60))
    rgb = _imageio_rgb(spark, p)  # palette output is true sRGB: no gamma trap
    exp = np.stack(
        [px, (px + GIF_PAL_G_OFF) % 256, (px + GIF_PAL_B_OFF) % 256], axis=1
    ).astype(np.int64)
    assert np.array_equal(rgb, exp)


def test_png_interchange_with_openjdk(spark, tmp_path):
    from ds_mapreduce_spark.operators.multimodal import _encode_png_bytes

    rng = np.random.RandomState(12)
    px = rng.randint(0, 256, 24 * 16 * 3).astype(np.uint8)
    p = str(tmp_path / "ours.png")
    with open(p, "wb") as f:
        f.write(_encode_png_bytes(px.tobytes(), 24, 16))
    rgb = _imageio_rgb(spark, p)
    assert np.array_equal(rgb, px.reshape(-1, 3).astype(np.int64))


def test_jpeg_interchange_with_openjdk(spark, tmp_path):
    from ds_mapreduce_spark.operators.jpeg import encode_jpeg_bytes, parse_jpeg

    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, 32 * 16).astype(np.uint8).tobytes()
    p = str(tmp_path / "ours.jpg")
    payload = encode_jpeg_bytes(px, 32, 16)
    with open(p, "wb") as f:
        f.write(payload)
    theirs = _imageio_gray(spark, p)
    ours = np.frombuffer(parse_jpeg(payload)[2], dtype=np.uint8).astype(np.int64)
    assert np.abs(theirs - ours).max() <= 1  # T.81 implementation variance


def test_our_decoder_reads_openjdk_encoded_jpeg(spark, tmp_path):
    """The REVERSE interchange direction: OUR parser must decode a file
    a FOREIGN encoder wrote. OpenJDK's JPEG writer emits baseline
    grayscale with its own (Annex K-style) Huffman and quant tables —
    nothing like our flat canonical tables — so a successful decode
    proves the DHT/DQT/SOF parsing paths work on real-world files, and
    matching OpenJDK's own decode of the same file pins the pixel
    values (same coefficients; only IDCT variance can differ)."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    w, h = 32, 16
    img = BI(w, h, BI.TYPE_BYTE_GRAY)
    rng = np.random.RandomState(31)
    for y in range(h):  # setRGB per pixel: py4j-safe (setSamples hits
        for x in range(w):  # an int[]/float[]/double[] overload clash)
            v = int(rng.randint(0, 256))
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
    p = str(tmp_path / "java_enc.jpg")
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", jvm.java.io.File(p))

    from ds_mapreduce_spark.operators.jpeg import parse_jpeg

    with open(p, "rb") as f:
        payload = f.read()
    w2, h2, ours = parse_jpeg(payload)
    assert (w2, h2) == (w, h)
    theirs = _imageio_gray(spark, p)
    assert (
        np.abs(theirs - np.frombuffer(ours, np.uint8).astype(np.int64)).max()
        <= 1
    )


def test_jpeg_color_interchange_with_openjdk(spark, tmp_path):
    """OpenJDK must decode our 4:4:4 YCbCr color files: exact
    dimensions, and pixels within the combined IDCT + color-transform
    implementation variance (both are implementation-defined; our
    fixed-point pair differs from libjpeg's by at most a few counts)."""
    from ds_mapreduce_spark.operators.jpeg import (
        encode_jpeg_color_bytes,
        parse_jpeg,
    )

    rng = np.random.RandomState(16)
    rgb = rng.randint(0, 256, 32 * 16 * 3).astype(np.uint8)
    p = str(tmp_path / "color.jpg")
    payload = encode_jpeg_color_bytes(rgb.tobytes(), 32, 16)
    with open(p, "wb") as f:
        f.write(payload)
    theirs = _imageio_rgb(spark, p).ravel()
    ours = np.frombuffer(parse_jpeg(payload)[2], dtype=np.uint8).astype(np.int64)
    assert len(theirs) == len(ours) == 32 * 16 * 3
    diff = np.abs(theirs - ours)
    assert diff.max() <= 6 and diff.mean() < 1.0


def test_jpeg_restart_intervals_interchange_with_openjdk(spark, tmp_path):
    """A file written WITH restart markers (DRI + RST0..RSTn cycling,
    per-segment DC reset) must decode identically in OpenJDK — proving
    the marker layout and byte realignment are spec-conformant, not a
    private convention our own decoder happens to mirror."""
    from ds_mapreduce_spark.operators.jpeg import encode_jpeg_bytes, parse_jpeg

    rng = np.random.RandomState(15)
    px = rng.randint(0, 256, 40 * 16).astype(np.uint8).tobytes()
    payload = encode_jpeg_bytes(px, 40, 16, restart_interval=2)
    p = str(tmp_path / "rst.jpg")
    with open(p, "wb") as f:
        f.write(payload)
    theirs = _imageio_gray(spark, p)
    ours = np.frombuffer(parse_jpeg(payload)[2], dtype=np.uint8).astype(np.int64)
    assert np.abs(theirs - ours).max() <= 1


def test_ulaw_interchange_with_javax_sound(spark, tmp_path):
    """javax.sound.sampled's mu-law converter (an independent G.711
    implementation) must expand our encoder's file to IDENTICAL PCM."""
    from ds_mapreduce_spark.operators.g711 import (
        encode_ulaw_wav_bytes,
        ulaw_decode_sample,
        ulaw_encode_sample,
    )

    rng = np.random.RandomState(14)
    samples = [int(v) for v in rng.randint(-32768, 32768, 256)]
    p = str(tmp_path / "ours.wav")
    with open(p, "wb") as f:
        f.write(encode_ulaw_wav_bytes(samples, rate=8000))
    jvm = spark._jvm
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.File(p)
    )
    assert "ULAW" in ais.getFormat().toString()
    enc = jvm.javax.sound.sampled.AudioFormat.Encoding
    pcm_fmt = jvm.javax.sound.sampled.AudioFormat(
        enc.PCM_SIGNED, 8000.0, 16, 1, 2, 8000.0, False
    )
    conv = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        pcm_fmt, ais
    )
    theirs = np.frombuffer(bytes(conv.readAllBytes()), dtype="<i2").astype(int)
    ours = np.array(
        [ulaw_decode_sample(ulaw_encode_sample(s)) for s in samples]
    )
    assert np.array_equal(theirs, ours)


def test_jpeg_constant_blocks_interchange_exactly(spark, tmp_path):
    from ds_mapreduce_spark.operators.jpeg import encode_jpeg_bytes, parse_jpeg

    for v in (0, 77, 128, 200, 255):
        px = bytes([v]) * 64
        p = str(tmp_path / f"const{v}.jpg")
        payload = encode_jpeg_bytes(px, 8, 8)
        with open(p, "wb") as f:
            f.write(payload)
        theirs = _imageio_gray(spark, p)
        ours = np.frombuffer(parse_jpeg(payload)[2], dtype=np.uint8).astype(
            np.int64
        )
        assert np.array_equal(theirs, ours), v


def test_animgif_interchange_with_openjdk(spark, tmp_path):
    """OpenJDK's GIF reader must see every delta frame of our animated
    GIF, report the sub-rectangle offsets we wrote, and — composed per
    the do-not-dispose semantics using its OWN alpha channel for our
    transparency masks — reproduce every composed canvas pixel-exactly
    (palette-mapped, true sRGB: no gamma trap for indexed color)."""
    from ds_mapreduce_spark.operators.animgif import (
        ANIM_FRAMES,
        encode_animgif_bytes,
    )
    from ds_mapreduce_spark.operators.gif import (
        GIF_H,
        GIF_PAL_B_OFF,
        GIF_PAL_G_OFF,
        GIF_W,
    )
    from tests.test_animgif import synth_frames

    frames = synth_frames(42)
    p = str(tmp_path / "anim.gif")
    with open(p, "wb") as f:
        f.write(encode_animgif_bytes(frames, GIF_W, GIF_H))

    jvm = spark._jvm
    iis = jvm.javax.imageio.ImageIO.createImageInputStream(
        jvm.java.io.File(p)
    )
    reader = jvm.javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert reader.getNumImages(True) == ANIM_FRAMES

    def descriptor_offsets(i: int) -> tuple[int, int]:
        tree = reader.getImageMetadata(i).getAsTree(
            "javax_imageio_gif_image_1.0"
        )
        node = tree.getFirstChild()
        while node is not None:
            if node.getNodeName() == "ImageDescriptor":
                attrs = node.getAttributes()
                return (
                    int(attrs.getNamedItem("imageLeftPosition").getNodeValue()),
                    int(attrs.getNamedItem("imageTopPosition").getNodeValue()),
                )
            node = node.getNextSibling()
        pytest.fail(f"frame {i}: no ImageDescriptor metadata")

    canvas = np.zeros((GIF_H, GIF_W, 3), dtype=np.int64)
    for i in range(ANIM_FRAMES):
        img = reader.read(i)
        w, h = img.getWidth(), img.getHeight()
        left, top = descriptor_offsets(i)
        argb = np.array(
            img.getRGB(0, 0, w, h, None, 0, w), dtype=np.int64
        ).reshape(h, w)
        alpha = (argb >> 24) & 0xFF
        rgb = np.stack(
            [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF], axis=-1
        )
        opaque = alpha == 255
        if i == 0:
            assert (w, h, left, top) == (GIF_W, GIF_H, 0, 0)
            assert opaque.all()
        else:
            # delta frames must be PROPER sub-rectangles with at least
            # one masked pixel — otherwise temporal coding isn't being
            # exercised
            assert w * h < GIF_W * GIF_H
            assert not opaque.all()
        canvas[top : top + h, left : left + w][opaque] = rgb[opaque]
        px = np.frombuffer(frames[i], dtype=np.uint8).reshape(GIF_H, GIF_W)
        exp = np.stack(
            [px, (px + GIF_PAL_G_OFF) % 256, (px + GIF_PAL_B_OFF) % 256],
            axis=-1,
        ).astype(np.int64)
        assert np.array_equal(canvas, exp), f"frame {i} composition differs"
    reader.dispose()
    iis.close()
