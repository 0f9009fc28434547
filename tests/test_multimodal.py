"""Multimodal operator tests: RAW codec round-trips through real Spark
mapInPandas plumbing; gated decoders raise NotImplementedError."""

import numpy as np
import pytest

from georiva_spark.operators import multimodal as mm


def _media_df(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string")


def test_image_features_roundtrip(spark):
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    df = _media_df(spark, [(1, "image", mm.encode_raw_image(img), "image/raw")])
    r = mm.image_features(df).collect()[0]
    assert (r.height, r.width, r.channels) == (3, 4, 1)
    assert r.mean == 5.5 and r.min == 0.0 and r.max == 11.0
    np.testing.assert_allclose(r.std, np.arange(12.0).std(), rtol=1e-7)


def test_resize_nearest(spark):
    img = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    df = _media_df(spark, [(1, "image", mm.encode_raw_image(img), "image/raw")])
    out = mm.resize_images(df, 4, 4).collect()[0]
    resized = mm.decode_raw_image(out.content)[:, :, 0]
    # 2×2→4×4 nearest upsample preserves range + block structure
    assert resized.min() == 1.0 and resized.max() == 4.0
    assert resized[0, 0] == 1.0 and resized[3, 3] == 4.0
    assert resized[0, 3] == 2.0 and resized[3, 0] == 3.0


def test_frame_sampling(spark):
    frames = np.stack([np.full((2, 2), float(i), dtype=np.float32)
                       for i in range(6)])
    df = _media_df(spark, [(7, "video", mm.encode_raw_video(frames), "video/raw")])
    out = mm.sample_frames(df, every=2).collect()
    assert [r.frame_index for r in out] == [0, 2, 4]
    vals = [mm.decode_raw_image(r.content)[0, 0, 0] for r in out]
    assert vals == [0.0, 2.0, 4.0]


def test_audio_features(spark):
    t = np.arange(8000, dtype=np.float32)
    sine = np.sin(2 * np.pi * 10 * t / 8000).astype(np.float32)  # 10 Hz, 1 s
    df = _media_df(spark, [(3, "audio", mm.encode_raw_audio(sine, 8000), "audio/raw")])
    r = mm.audio_features(df).collect()[0]
    assert r.rate == 8000 and r.n_samples == 8000 and r.duration_s == 1.0
    np.testing.assert_allclose(r.rms, 1 / np.sqrt(2), rtol=1e-3)
    assert 19 <= r.zero_crossings <= 20  # 10 Hz over 1 s


def test_gated_decoder_raises(spark):
    df = _media_df(spark, [(1, "image", b"\xff\xd8\xff\xe0jpegdata", "image/jpeg")])
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        mm.image_features(df).collect()


def test_png_decode_matches_raw_on_identical_pixels(spark):
    """The PNG path is real decode, not a stub: the same uint8 pixels
    shipped as RAW float32 and as an actual PNG (color type 2) must
    yield identical features; 16-bit grayscale and RGBA also round-trip
    through png_encode_image/png_decode_image bit-exactly."""
    from georiva_spark.sources.png_codec import (png_decode_image,
                                                 png_encode_image)
    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    df = _media_df(spark, [
        (1, "image", mm.encode_raw_image(px.astype(np.float32)),
         "image/raw"),
        (2, "image", png_encode_image(px), "image/png"),
    ])
    rows = {r.media_id: r for r in mm.image_features(df).collect()}
    for f in ("height", "width", "channels", "mean", "std", "min", "max"):
        assert getattr(rows[1], f) == getattr(rows[2], f), f
    # direct codec round-trips: gray, RGB, RGBA
    for c in (1, 3, 4):
        a = rng.integers(0, 256, (5, 7, c), dtype=np.uint8)
        np.testing.assert_array_equal(
            png_decode_image(png_encode_image(a)), a)


def test_png_resize_path(spark):
    """resize_images decodes PNG input and emits RAW output whose pixels
    are the nearest-neighbour selection of the PNG's."""
    from georiva_spark.sources.png_codec import png_encode_image
    px = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    df = _media_df(spark, [(7, "image", png_encode_image(px),
                            "image/png")])
    r = mm.resize_images(df, 4, 4).collect()[0]
    got = mm.decode_raw_image(r.content)[:, :, 0]
    np.testing.assert_array_equal(got, px[1::2, 1::2, 0].astype(np.float32))


def test_jpeg_codec_roundtrip_matrix():
    """Baseline JPEG codec: gray / RGB 4:4:4 / RGB 4:2:0 across the
    quality ladder — error bounded and monotone, q=100 near-lossless;
    non-baseline SOFs gate by name."""
    from georiva_spark.sources.jpeg_codec import jpeg_decode, jpeg_encode
    rng = np.random.default_rng(31)
    g = (128 + 60 * np.sin(np.arange(32)[:, None] / 5)
         * np.cos(np.arange(48)[None, :] / 7)).astype(np.uint8)
    prev = None
    for q in (50, 70, 90, 100):
        dec = jpeg_decode(jpeg_encode(g, quality=q))[:, :, 0]
        err = float(np.abs(dec.astype(int) - g.astype(int)).mean())
        assert err <= (prev if prev is not None else 2.0) + 0.25
        prev = err
    assert np.abs(jpeg_decode(jpeg_encode(g, quality=100))[:, :, 0]
                  .astype(int) - g.astype(int)).max() <= 1
    rgb = rng.integers(0, 256, (35, 52, 3), dtype=np.uint8)
    rgb[:, :, 2] = 100                     # keep chroma tame
    for sub in (False, True):
        dec = jpeg_decode(jpeg_encode(rgb, quality=95, subsample=sub))
        assert dec.shape == (35, 52, 3)
    # lossless coding gates by name (progressive now decodes natively)
    buf = bytearray(jpeg_encode(g, quality=90))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        jpeg_decode(bytes(buf))


def test_jpeg_through_image_features(spark):
    """JPEG payloads flow through the multimodal seam: stats land close
    to the RAW-encoded truth (lossy, so approx — the plumbing and the
    colorspace math are what is under test)."""
    from georiva_spark.sources.jpeg_codec import jpeg_encode
    rng = np.random.default_rng(33)
    base = np.zeros((16, 16, 3), np.uint8)
    base[:, :, 0] = np.linspace(30, 220, 16)[None, :]
    base[:, :, 1] = np.linspace(60, 180, 16)[:, None]
    base[:, :, 2] = 90
    df = _media_df(spark, [
        (1, "image", mm.encode_raw_image(base.astype(np.float32)),
         "image/raw"),
        (2, "image", jpeg_encode(base, quality=95), "image/jpeg"),
    ])
    rows = {r.media_id: r for r in mm.image_features(df).collect()}
    assert rows[2].height == 16 and rows[2].width == 16
    assert rows[2].channels == 3
    assert abs(rows[1].mean - rows[2].mean) < 2.0
    assert abs(rows[1].std - rows[2].std) < 3.0


def test_jpeg_restart_markers():
    """DRI + RSTn streams decode identically to the unsegmented stream
    (DC predictors reset, bit alignment at each marker)."""
    from georiva_spark.sources.jpeg_codec import jpeg_decode, jpeg_encode
    g = (128 + 60 * np.sin(np.arange(64)[:, None] / 5)
         * np.cos(np.arange(64)[None, :] / 7)).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(g, quality=90))
    for ri in (1, 3):
        enc = jpeg_encode(g, quality=90, restart_interval=ri)
        assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
        np.testing.assert_array_equal(jpeg_decode(enc), base)


def test_jpeg_q100_constant_blocks_identity_whole_range():
    """The invariant image_features_jpeg's oracle rests on: EVERY uint8
    value round-trips bit-exactly through baseline JPEG q=100 when the
    image is 8x8-block-constant (pure DC, top-left quantizer 1)."""
    from georiva_spark.sources.jpeg_codec import jpeg_decode, jpeg_encode
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)      # 128x128
    dec = jpeg_decode(jpeg_encode(img, quality=100))[:, :, 0]
    np.testing.assert_array_equal(dec, img)


def test_scene_cuts_golden(spark):
    """Hand-built video: flat, flat, jump, flat → cuts at frames 0, 2."""
    frames = np.stack([np.full((4, 4), 0.1), np.full((4, 4), 0.15),
                       np.full((4, 4), 0.9), np.full((4, 4), 0.88)])
    df = _media_df(spark, [(5, "video",
                            mm.encode_raw_video(frames.astype(np.float32)),
                            "video/raw")])
    rows = {r.frame_index: r for r in
            mm.scene_cuts(df.select("media_id", "content"),
                          threshold=0.2).collect()}
    assert [rows[i].cut for i in range(4)] == [True, False, True, False]
    assert rows[2].frame_mean == pytest.approx(0.9, abs=1e-6)


def test_audio_spectrum_pure_tone(spark):
    """A pure 4-cycle sine concentrates all band energy at bin 4 and
    the centroid sits on 4; a DC-ish clip spreads nothing into the
    probed bins."""
    t = np.arange(64)
    tone = np.sin(2 * np.pi * 4 * t / 64).astype(np.float32)
    df = _media_df(spark, [(1, "audio", mm.encode_raw_audio(tone, 64),
                            "audio/raw")])
    r = mm.audio_spectrum(df.select("media_id", "content"),
                          bins=(1, 2, 4, 8)).collect()[0]
    assert r.e4 == pytest.approx((64 / 2) ** 2, rel=1e-6)
    for k in (1, 2, 8):
        assert getattr(r, f"e{k}") == pytest.approx(0.0, abs=1e-6)
    assert r.centroid == pytest.approx(4.0, rel=1e-6)


def test_media_store_partitioning_and_pruning(spark, tmp_path):
    """The layout the multimodal scale story assumes, made real:
    (kind, bucket) partitions, kind filter prunes at the partition
    level, dynamic overwrite replaces only touched partitions, and the
    decode operators run straight off the stored table."""
    from georiva_spark.sources import media_store as ms
    rows = []
    for i in range(8):
        px = np.full((4, 4), float(i), np.float32)
        rows.append((i, "image", mm.encode_raw_image(px), "image/raw"))
    for i in range(8, 12):
        rows.append((i, "audio",
                     mm.encode_raw_audio(np.ones(16, np.float32), 16),
                     "audio/raw"))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string")
    path = str(tmp_path / "media")
    ms.write_media(media, path, n_buckets=4)
    back = ms.read_media(spark, path)
    assert back.count() == 12
    imgs = ms.read_media(spark, path, kind="image")
    plan = imgs._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "kind" in plan.split(
        "PartitionFilters", 1)[1][:200]
    feats = {r.media_id: r.mean for r in
             mm.image_features(imgs).collect()}
    assert feats[3] == 3.0 and len(feats) == 8
    # idempotent re-ingest: overwrite the image slice with new content
    redo = spark.createDataFrame(
        [(i, "image",
          mm.encode_raw_image(np.full((4, 4), 99.0, np.float32)),
          "image/raw") for i in range(8)],
        "media_id long, kind string, content binary, mime string")
    ms.overwrite_media_slice(redo, path, n_buckets=4)
    again = ms.read_media(spark, path)
    assert again.count() == 12                  # audio untouched
    assert all(r.mean == 99.0 for r in
               mm.image_features(ms.read_media(spark, path, "image"))
               .collect())


def test_palette_png_decodes_natively(spark):
    """Color type 3 (indexed) — the most common quantized web PNG —
    resolves through PLTE (+ tRNS alpha) without Pillow, across bit
    depths 1/2/4/8, and flows through image_features."""
    import struct
    import zlib as _z

    from georiva_spark.sources.png_codec import _chunk, png_decode_image

    sig = b"\x89PNG\r\n\x1a\n"

    def make(idx, plte, depth, trns=None):
        h, w = idx.shape
        stride = (w * depth + 7) // 8
        rows = bytearray()
        for r in range(h):
            rows.append(0)
            if depth == 8:
                rows += bytes(idx[r]) + b"\0" * (stride - w)
            else:
                bits = []
                for v in idx[r]:
                    bits += [(int(v) >> k) & 1
                             for k in range(depth - 1, -1, -1)]
                bits += [0] * (stride * 8 - len(bits))
                rows += np.packbits(np.array(bits, np.uint8)).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        out = sig + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE",
                                                   bytes(plte.ravel()))
        if trns is not None:
            out += _chunk(b"tRNS", bytes(trns))
        return out + _chunk(b"IDAT", _z.compress(bytes(rows), 6)) \
            + _chunk(b"IEND", b"")

    rng = np.random.default_rng(3)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    for depth in (1, 2, 4, 8):
        idx = rng.integers(0, min(16, 1 << depth), (5, 9),
                           dtype=np.uint8)
        np.testing.assert_array_equal(
            png_decode_image(make(idx, plte, depth)), plte[idx])
    # through the operator seam
    idx = rng.integers(0, 16, (8, 8), dtype=np.uint8)
    df = _media_df(spark, [(1, "image", make(idx, plte, 8),
                            "image/png")])
    r = mm.image_features(df).collect()[0]
    assert (r.height, r.width, r.channels) == (8, 8, 3)
    assert r.mean == pytest.approx(float(plte[idx].mean()))


def test_wav_decode_formats(spark):
    """RIFF/WAVE PCM decodes natively across 8/16/24/32-bit int and
    32-bit float, stereo downmixes by mean, and flows through
    audio_features."""
    import struct as _s

    def wav(samples_f32, rate, bits, code=1, nch=1):
        if code == 3:
            data = np.asarray(samples_f32, "<f4").tobytes()
        elif bits == 8:
            data = (np.asarray(samples_f32) * 128 + 128).clip(0, 255) \
                .astype(np.uint8).tobytes()
        elif bits == 16:
            data = (np.asarray(samples_f32) * 32768).clip(-32768, 32767) \
                .astype("<i2").tobytes()
        elif bits == 24:
            v = (np.asarray(samples_f32) * (1 << 23)).clip(
                -(1 << 23), (1 << 23) - 1).astype(np.int64)
            v = np.where(v < 0, v + (1 << 24), v)
            b = np.zeros((len(v), 3), np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            data = b.tobytes()
        else:
            data = (np.asarray(samples_f32) * 2147483648).clip(
                -2**31, 2**31 - 1).astype("<i4").tobytes()
        fmt = _s.pack("<HHIIHH", code, nch, rate,
                      rate * nch * bits // 8, nch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
                + b"data" + _s.pack("<I", len(data)) + data)
        return b"RIFF" + _s.pack("<I", len(body)) + body

    t = np.arange(800) / 8000.0
    sine = (0.5 * np.sin(2 * np.pi * 100 * t)).astype(np.float32)
    for bits, code, tol in ((8, 1, 2e-2), (16, 1, 1e-3), (24, 1, 1e-5),
                            (32, 1, 1e-7), (32, 3, 0)):
        x, rate = mm.decode_raw_audio(wav(sine, 8000, bits, code))
        assert rate == 8000 and len(x) == 800
        assert float(np.abs(x - sine).max()) <= tol
    # stereo downmix
    inter = np.empty(1600, np.float32)
    inter[0::2] = sine
    inter[1::2] = -sine
    x, _ = mm.decode_raw_audio(wav(inter, 8000, 32, 3, nch=2))
    assert float(np.abs(x).max()) < 1e-7          # L+R cancels
    # operator seam
    df = _media_df(spark, [(9, "audio", wav(sine, 8000, 16, 1),
                            "audio/wav")])
    r = mm.audio_features(df).collect()[0]
    assert r.rate == 8000 and r.n_samples == 800
    np.testing.assert_allclose(r.rms, 0.5 / np.sqrt(2), rtol=1e-3)


def test_progressive_jpeg_decodes_identically_to_baseline(spark):
    """SOF2 progressive (spectral selection + successive approximation,
    EOB runs, correction-bit interleaving) must reconstruct EXACTLY the
    same pixels as the baseline encoding of the same image — both carry
    the identical quantized coefficients."""
    from georiva_spark.sources.jpeg_codec import (jpeg_decode,
                                                  jpeg_encode,
                                                  jpeg_encode_progressive)
    rng = np.random.default_rng(41)
    g = (128 + 60 * np.sin(np.arange(32)[:, None] / 5)
         * np.cos(np.arange(48)[None, :] / 7)).astype(np.uint8)
    for q in (30, 90, 100):
        np.testing.assert_array_equal(
            jpeg_decode(jpeg_encode_progressive(g, quality=q)),
            jpeg_decode(jpeg_encode(g, quality=q)))
    rgb = rng.integers(0, 256, (19, 26, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        jpeg_decode(jpeg_encode_progressive(rgb, quality=85)),
        jpeg_decode(jpeg_encode(rgb, quality=85)))
    # through the operator seam: a progressive payload just works
    df = _media_df(spark, [(1, "image",
                            jpeg_encode_progressive(g, quality=90),
                            "image/jpeg")])
    r = mm.image_features(df).collect()[0]
    assert (r.height, r.width, r.channels) == (32, 48, 1)


def test_bilinear_resize_and_clip_preprocess(spark):
    """Bilinear 2x upsample of a ramp interpolates linearly (interior
    pixels hit exact midpoints); preprocess_images resizes the shortest
    side and center-crops to a square."""
    ramp = np.arange(16, dtype=np.float32).reshape(4, 4)
    df = _media_df(spark, [(1, "image", mm.encode_raw_image(ramp),
                            "image/raw")])
    r = mm.resize_images(df, 8, 8, method="bilinear").collect()[0]
    out = mm.decode_raw_image(r.content)[:, :, 0]
    # ramp is linear (v = 4y + x), so interior bilinear samples are
    # exact: out[i,j] = 4*fy + fx with fy=(i+.5)/2-.5, fx=(j+.5)/2-.5
    assert out[4, 3] == pytest.approx(4 * 1.75 + 1.25)
    assert out[3, 5] == pytest.approx(4 * 1.25 + 2.25)
    assert out[0, 0] == ramp[0, 0]                  # corners clamp
    # CLIP-style preprocess: 40x20 → shortest side 8 → 16x8 → crop 8x8
    tall = np.arange(800, dtype=np.float32).reshape(40, 20)
    df = _media_df(spark, [(2, "image", mm.encode_raw_image(tall),
                            "image/raw")])
    p = mm.preprocess_images(df, size=8).collect()[0]
    assert (p.height, p.width) == (8, 8)
    crop = mm.decode_raw_image(p.content)[:, :, 0]
    assert crop.shape == (8, 8)
    # the crop is centered: its mean sits near the image's global mean
    assert abs(crop.mean() - tall.mean()) < tall.mean() * 0.1


def test_wav_extensible_subformat_and_zero_scan_jpeg():
    """Second-review regressions: WAVE_FORMAT_EXTENSIBLE resolves the
    SubFormat GUID (float subformat decodes as float, ADPCM gates by
    name), and a progressive JPEG truncated before its first scan
    raises instead of fabricating a gray image."""
    import struct as _s

    sine = (0.5 * np.sin(np.arange(100) / 5)).astype("<f4")
    guid_tail = bytes.fromhex("000010008000" + "00aa00389b71")

    def ext_wav(code, bits, data):
        fmt = (_s.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, bits)
               + _s.pack("<HHI", 22, bits, 4)
               + _s.pack("<H", code) + b"\x00\x00" + guid_tail)
        body = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
                + b"data" + _s.pack("<I", len(data)) + data)
        return b"RIFF" + _s.pack("<I", len(body)) + body

    x, rate = mm.decode_raw_audio(ext_wav(3, 32, sine.tobytes()))
    assert rate == 8000
    np.testing.assert_array_equal(x, sine)
    with pytest.raises(NotImplementedError, match="format code 2"):
        mm.decode_raw_audio(ext_wav(2, 4, b"\0\0\0\0"))

    from georiva_spark.sources.jpeg_codec import (jpeg_decode,
                                                  jpeg_encode_progressive)
    g = np.full((16, 16), 7, np.uint8)
    enc = bytearray(jpeg_encode_progressive(g, 90))
    trunc = bytes(enc[:enc.find(b"\xff\xda")]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="no SOS"):
        jpeg_decode(trunc)


def test_video_container_seam_named_gate_and_plugin(spark):
    """The video decode seam: an MP4 (ftyp box) or WebM (EBML magic)
    payload raises BY NAME when no backend is available; a decoder
    registered via register_video_decoder is captured into the plan
    closure and drives sample_frames / scene_cuts end-to-end; RAW still
    decodes natively alongside."""
    import numpy as np
    import pytest

    from georiva_spark.operators import multimodal as mm

    fake_mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64
    fake_webm = mm._EBML_SIG + b"\x00" * 64

    # no backend: named gates
    with pytest.raises(NotImplementedError, match="MP4/QuickTime"):
        mm._decode_video_frames(fake_mp4, [])
    with pytest.raises(NotImplementedError, match="WebM/Matroska"):
        mm._decode_video_frames(fake_webm, [])
    with pytest.raises(ValueError, match="unrecognized video payload"):
        mm._decode_video_frames(b"\x00" * 32, [])

    # a registered plugin decodes the container through the operators
    frames = np.stack([np.full((4, 4), float(i), dtype=np.float32)
                       for i in (0, 0, 9, 9)])

    def fake_decoder(content):
        if content[4:8] != b"ftyp":
            raise NotImplementedError("not mine")
        return frames

    mm.register_video_decoder("fake-mp4", fake_decoder)
    try:
        media = spark.createDataFrame(
            [(1, bytearray(fake_mp4)),
             (2, bytearray(mm.encode_raw_video(frames)))],
            "media_id long, content binary")
        out = mm.sample_frames(media, every=2).collect()
        assert sorted((r.media_id, r.frame_index) for r in out) == \
            [(1, 0), (1, 2), (2, 0), (2, 2)]
        cuts = {(r.media_id, r.frame_index): r.cut
                for r in mm.scene_cuts(media, threshold=5.0).collect()}
        # frame 0 starts a scene; the 0->9 jump at frame 2 is a cut
        assert cuts[(1, 0)] and cuts[(1, 2)] and not cuts[(1, 1)]
        assert cuts[(2, 2)]
    finally:
        mm._VIDEO_PLUGINS.clear()


def test_video_mp4_decode_via_pyav_when_available(spark):
    """Integration proof of the MP4/H.264 plugin seam against a REAL
    container (r8, verdict item: the gate's contract proven when the
    dependency exists): PyAV encodes a 4-frame H.264 MP4, the seam
    autodetects the backend (`_video_decoder_chain` appends PyAV when
    importable), and sample_frames / scene_cuts run end-to-end on the
    real container next to a RAW control. SKIPS (by design) where
    PyAV is absent — the named NotImplementedError gate is separately
    pinned by test_video_container_seam_named_gate_and_plugin."""
    import io

    import numpy as np
    import pytest

    av = pytest.importorskip("av")
    from georiva_spark.operators import multimodal as mm

    # 4 frames: two dark, two bright — a scene cut at frame 2
    frames8 = [np.full((16, 16), v, dtype=np.uint8)
               for v in (10, 10, 200, 200)]
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as c:
        stream = c.add_stream("h264", rate=4)
        stream.width, stream.height = 16, 16
        stream.pix_fmt = "yuv420p"
        for f in frames8:
            frame = av.VideoFrame.from_ndarray(
                np.stack([f] * 3, axis=-1), format="rgb24")
            for pkt in stream.encode(frame):
                c.mux(pkt)
        for pkt in stream.encode():
            c.mux(pkt)
    mp4 = buf.getvalue()
    assert mp4[4:8] == b"ftyp"                  # a real MP4 container

    chain = mm._video_decoder_chain()
    assert any(n == "pyav" for n, _ in chain)   # autodetected
    decoded = mm._decode_video_frames(mp4, chain)
    assert decoded.shape == (4, 16, 16)

    media = spark.createDataFrame(
        [(1, bytearray(mp4))], "media_id long, content binary")
    out = mm.sample_frames(media, every=2).collect()
    assert sorted(r.frame_index for r in out) == [0, 2]
    cuts = {r.frame_index: r.cut
            for r in mm.scene_cuts(media, threshold=50.0).collect()}
    assert cuts[0] and cuts[2] and not cuts[1]  # the 10->200 jump


def test_image_dhash_gradient_signs_and_brightness_invariance(spark):
    import numpy as np
    from georiva_spark.operators import multimodal as mm
    ramp = np.tile(np.arange(8, dtype=np.float32), (8, 1))   # all < bits
    flat = np.zeros((8, 8), dtype=np.float32)                # no bits
    rows = [(1, "image", mm.encode_raw_image(ramp), "image/raw"),
            (2, "image", mm.encode_raw_image(flat), "image/raw"),
            (3, "image", mm.encode_raw_image(ramp + 100.0), "image/raw")]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string")
    got = {r.media_id: r.dhash for r in mm.image_dhash(media).collect()}
    assert got[1] == (1 << 56) - 1
    assert got[2] == 0
    assert got[3] == got[1]        # brightness shift preserves the hash


def test_image_near_dup_recovers_planted_variants_only(spark):
    import numpy as np
    from georiva_spark.operators import multimodal as mm
    rng = np.random.default_rng(5)
    imgs = {i: rng.normal(size=(8, 8)).astype(np.float32)
            for i in range(10)}
    v = imgs[0].copy()
    v[0, 0], v[0, 1] = imgs[0][0, 1], imgs[0][0, 0]   # hamming <= 2
    rows = [(i, "image", mm.encode_raw_image(a), "image/raw")
            for i, a in imgs.items()]
    rows.append((100, "image", mm.encode_raw_image(imgs[0]), "image/raw"))
    rows.append((200, "image", mm.encode_raw_image(v), "image/raw"))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string")
    got = {(r.id_a, r.id_b): r.hamming
           for r in mm.image_near_dup(media, max_hamming=3).collect()}
    assert got[(0, 100)] == 0
    assert (0, 200) in got and got[(0, 200)] <= 2
    assert (100, 200) in got
    assert len(got) == 3            # random gaussians never within 3


def test_audio_fingerprint_gain_invariance_and_delta_signs(spark):
    import numpy as np
    from georiva_spark.operators import multimodal as mm
    rng = np.random.default_rng(9)
    x = rng.normal(size=64).astype(np.float32)
    # ramp loudness: the SAME 8-sample frame repeated, frame f scaled
    # by (f+1) — every band's energy is (f+1)^2 * E0[k], strictly
    # rising frame-over-frame, so ALL 28 bits set
    ramp = (np.tile(x[:8], (8, 1))
            * np.arange(1, 9, dtype=np.float32)[:, None]).ravel()
    rows = [(1, "audio", mm.encode_raw_audio(x, rate=64), "audio/raw"),
            (2, "audio", mm.encode_raw_audio(x * np.float32(2.0),
                                             rate=64), "audio/raw"),
            (3, "audio", mm.encode_raw_audio(ramp, rate=64), "audio/raw")]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string")
    got = {r.media_id: r.fp
           for r in mm.audio_fingerprint(media).collect()}
    # defaults: 29 overlapped frames -> 112 bits -> two 56-bit words
    assert all(len(v) == 2 for v in got.values())
    assert got[2] == got[1]           # 2x gain: fingerprint-invariant
    # non-overlapping frames (hop = frame_len): 8 frames -> 28 bits,
    # and the strictly-rising ramp sets every delta bit
    got8 = {r.media_id: r.fp
            for r in mm.audio_fingerprint(media, frame_len=8,
                                          hop=8).collect()}
    assert got8[3] == [(1 << 28) - 1]  # monotone loudness: all bits
    assert got8[2] == got8[1]


def test_audio_near_dup_recovers_planted_copies(spark):
    import numpy as np
    from georiva_spark.operators import multimodal as mm
    rng = np.random.default_rng(13)
    clips = {i: rng.normal(size=64).astype(np.float32) for i in range(8)}
    rows = [(i, "audio", mm.encode_raw_audio(a, rate=64), "audio/raw")
            for i, a in clips.items()]
    rows.append((100, "audio", mm.encode_raw_audio(clips[0], rate=64),
                 "audio/raw"))
    rows.append((200, "audio",
                 mm.encode_raw_audio(clips[0] * np.float32(0.5),
                                     rate=64), "audio/raw"))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, mime string")
    got = {(r.id_a, r.id_b): r.hamming
           for r in mm.audio_near_dup(media, max_hamming=2).collect()}
    assert got[(0, 100)] == 0 and got[(0, 200)] == 0
    assert (100, 200) in got
    assert all(a in (0, 100, 200) and b in (0, 100, 200)
               for a, b in got)       # random clips never within 2


def test_video_fingerprint_brightness_invariant_frame_reorder_not(spark):
    import numpy as np
    from georiva_spark.operators import multimodal as mm
    rng = np.random.default_rng(17)
    v = rng.normal(size=(4, 4, 4)).astype(np.float32)
    rows = [(1, mm.encode_raw_video(v)),
            (2, mm.encode_raw_video(v + np.float32(1.0))),
            (3, mm.encode_raw_video(v[::-1].copy()))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r.fp
           for r in mm.video_fingerprint(media).collect()}
    # two 48-bit words -> one 96-bit integer per clip
    u = {k: w[0] | (w[1] << 48) for k, w in got.items()}
    # brightness shift: gradient signs survive up to f32 tie-rounding
    assert bin(u[1] ^ u[2]).count("1") <= 3
    # frame reorder permutes whole 24-bit per-frame blocks (12
    # horizontal + 12 vertical gradient signs per frame)
    blocks = [(u[1] >> (24 * n)) & 0xFFFFFF for n in range(4)]
    rblocks = [(u[3] >> (24 * n)) & 0xFFFFFF for n in range(4)]
    assert rblocks == blocks[::-1]


def test_video_near_dup_recovers_planted_copies(spark):
    import numpy as np
    from georiva_spark.operators import multimodal as mm
    rng = np.random.default_rng(19)
    clips = {i: rng.normal(size=(4, 4, 4)).astype(np.float32)
             for i in range(8)}
    rows = [(i, mm.encode_raw_video(a)) for i, a in clips.items()]
    rows.append((100, mm.encode_raw_video(clips[0])))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {(r.id_a, r.id_b): r.hamming
           for r in mm.video_near_dup(media, max_hamming=3).collect()}
    assert got == {(0, 100): 0}     # only the planted copy pairs up


def test_avi_mjpeg_roundtrip_and_named_gates(spark):
    import numpy as np
    import pytest
    from georiva_spark.sources.avi_codec import (avi_mjpeg_decode,
                                                 avi_mjpeg_encode)
    r, c = np.mgrid[0:8, 0:8]
    frames = np.stack([((r + 2 * c + n) % 8).astype(np.uint8) * 32
                       for n in range(4)])
    avi = avi_mjpeg_encode(frames, quality=100)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    dec = avi_mjpeg_decode(avi)
    assert dec.shape == (4, 8, 8)
    # quality-100 baseline JPEG: every pixel within a few gray levels
    assert np.abs(dec - frames.astype(np.float32)).max() < 8.0
    # non-MJPEG codec: named gate, not a garbage decode
    bad = avi.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="only MJPEG"):
        avi_mjpeg_decode(bad)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_mjpeg_decode(b"nonsense")


def test_video_fingerprint_and_scenes_through_mjpeg_avi(spark):
    """The dependency-free MJPEG/AVI container path: the SAME clip
    shipped as RAW and as an MJPEG AVI must fingerprint identically
    (all gradient margins are ≥32 gray levels, far above quality-100
    JPEG error), and scene_cuts must find the planted brightness
    jump."""
    import numpy as np
    from georiva_spark.operators import multimodal as mm
    from georiva_spark.sources.avi_codec import avi_mjpeg_encode
    r, c = np.mgrid[0:8, 0:8]
    frames = np.stack([((r + 2 * c + n) % 8).astype(np.uint8) * 32
                       for n in range(4)])
    media = spark.createDataFrame(
        [(1, mm.encode_raw_video(frames.astype(np.float32))),
         (2, bytes(avi_mjpeg_encode(frames, quality=100)))],
        "media_id long, content binary")
    got = {m.media_id: m.fp for m in mm.video_fingerprint(media).collect()}
    assert got[2] == got[1]          # container path == RAW path

    bright = frames.copy()
    bright[2] = np.clip(bright[2].astype(np.int32) + 160,
                        0, 255).astype(np.uint8)
    scenes = spark.createDataFrame(
        [(3, bytes(avi_mjpeg_encode(bright, quality=100)))],
        "media_id long, content binary")
    cuts = {r2.frame_index: r2.cut
            for r2 in mm.scene_cuts(scenes, threshold=80.0).collect()}
    assert cuts[0] and cuts[2] and cuts[3]      # jump in AND out
    assert not cuts[1]


def test_warc_codec_roundtrip_and_response_strip(spark, tmp_path):
    """WARC/WET container: plain and gzip-per-record framing both parse
    back exactly; 'response' records drop the HTTP head; warcinfo /
    request records are skipped; junk raises by name."""
    import pytest
    from georiva_spark.sources.warc_codec import (warc_encode,
                                                  warc_records, warc_scan)
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>body text</html>")
    recs = [
        {"warc_type": "warcinfo", "payload": "software: test"},
        {"warc_type": "conversion", "payload": "extracted text one",
         "target_uri": "http://a.example/1"},
        {"warc_type": "response", "payload": http,
         "target_uri": "http://a.example/2"},
        {"warc_type": "conversion", "payload": "ünicode — text",
         "target_uri": "http://a.example/3"},
    ]
    for gz, name in ((False, "t.warc"), (True, "t.warc.gz")):
        buf = warc_encode(recs, gz=gz)
        parsed = list(warc_records(buf))
        assert [r["headers"]["warc-type"] for r in parsed] == [
            "warcinfo", "conversion", "response", "conversion"]
        assert parsed[1]["payload"] == b"extracted text one"
        fp = tmp_path / name
        fp.write_bytes(buf)
        rows = {r.target_uri: r for r in warc_scan(
            spark, str(fp)).collect()}
        assert rows["http://a.example/2"].text == "<html>body text</html>"
        assert rows["http://a.example/1"].n_bytes == 18
        assert rows["http://a.example/3"].text == "ünicode — text"
        assert len(rows) == 3          # warcinfo skipped
    with pytest.raises(ValueError, match="WARC"):
        list(warc_records(b"GIBBERISH NOT A WARC"))


def test_warc_truncated_record_raises():
    import pytest
    from georiva_spark.sources.warc_codec import warc_encode, warc_records
    buf = warc_encode([{"warc_type": "conversion", "payload": "hello"}])
    with pytest.raises(ValueError, match="truncated"):
        list(warc_records(buf[:-9]))          # cut into the payload


def test_avi_codec_gate_fires_before_frame_decode():
    """A reordered AVI (movi before hdrl) must still hit the NAMED
    codec gate, never feed non-JPEG bytes into jpeg_decode."""
    import numpy as np
    import pytest
    from georiva_spark.sources.avi_codec import (avi_mjpeg_decode,
                                                 avi_mjpeg_encode)
    r, c = np.mgrid[0:8, 0:8]
    frames = np.stack([((r + c) % 8).astype(np.uint8) * 32
                       for _ in range(2)])
    avi = bytearray(avi_mjpeg_encode(frames, quality=100))
    # swap hdrl and movi LISTs to simulate a reordered writer
    import struct as st
    pos, lists = 12, []
    end = 8 + st.unpack_from("<I", avi, 4)[0]
    while pos + 8 <= end:
        fcc = bytes(avi[pos:pos + 4]); sz = st.unpack_from("<I", avi, pos + 4)[0]
        lists.append((fcc, pos, 8 + sz + (sz & 1)))
        pos += 8 + sz + (sz & 1)
    chunks = [bytes(avi[p:p + ln]) for _, p, ln in lists]
    reordered = bytes(avi[:12]) + b"".join(reversed(chunks))
    hdr = bytearray(reordered); st.pack_into("<I", hdr, 4, len(reordered) - 8)
    out = avi_mjpeg_decode(bytes(hdr))
    assert out.shape == (2, 8, 8)          # still decodes (gate first)
    bad = bytes(hdr).replace(b"MJPG", b"XVID")
    with pytest.raises(NotImplementedError, match="only MJPEG"):
        avi_mjpeg_decode(bad)
