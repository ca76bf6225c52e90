import numpy as np
import pytest

from customer_er_spark import codecs
from customer_er_spark.phash import hamming64, phash64


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("fmt", ["raw", "png"])
@pytest.mark.parametrize("shape", [(32, 32), (17, 23), (16, 16, 3)])
def test_lossless_roundtrip(rng, fmt, shape):
    img = rng.integers(0, 256, shape).astype(np.uint8)
    if fmt == "png" and len(shape) == 3:
        pass  # rgb supported
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    ref = img if img.ndim == 2 else img
    np.testing.assert_array_equal(out, ref)


def test_qpng_psnr_above_40(rng):
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    out = codecs.decode(codecs.encode(img, "qpng"), "qpng")
    assert codecs.psnr(img, out) >= 40.0


def test_png_decode_handles_filtered_input():
    # zlib stream with per-row filter types 0..4 written by us must round-trip
    img = (np.arange(25 * 25) % 251).reshape(25, 25).astype(np.uint8)
    data = codecs.png_encode(img)
    np.testing.assert_array_equal(codecs.png_decode(data), img)


def test_psnr_identity_inf(rng):
    img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    assert codecs.psnr(img, img) == float("inf")


def test_phash_stability_and_sensitivity(rng):
    from customer_er_spark.datagen import _make_image, _noisy_image

    img = _make_image(rng, 32, 32)
    ph = phash64(img)
    assert ph == phash64(img.copy())  # deterministic
    noisy = _noisy_image(rng, img)
    assert hamming64(ph, phash64(noisy)) <= 6  # near-dup stays close
    other = _make_image(rng, 32, 32)
    assert hamming64(ph, phash64(other)) > 10  # distinct images far apart


def test_phash_batch_matches_scalar(rng):
    from customer_er_spark.phash import phash64_batch, resize_area, to_gray

    imgs = [rng.integers(0, 256, (32, 32)).astype(np.uint8) for _ in range(5)]
    batch = np.stack([resize_area(to_gray(i)) for i in imgs])
    got = phash64_batch(batch)
    want = [phash64(i) for i in imgs]
    assert list(got) == want


# ---------------------------------------------------------------------------
# baseline JPEG (pure-numpy codec)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_psnr(rng):
    from customer_er_spark import codecs

    # smooth/natural-ish content: PSNR well above the 40dB budget
    grad = np.zeros((40, 40, 3), np.uint8)
    grad[..., 0] = np.linspace(0, 255, 40).astype(np.uint8)[None, :]
    grad[..., 1] = np.linspace(0, 255, 40).astype(np.uint8)[:, None]
    grad[..., 2] = 128
    dec = codecs.decode(codecs.encode(grad, "jpeg"), "jpeg")
    assert dec.shape == grad.shape
    assert codecs.psnr(grad, dec) >= 40.0

    # gray, non-multiple-of-8 size
    g = np.clip(
        np.round(np.indices((17, 23)).sum(0) * 5), 0, 255
    ).astype(np.uint8)
    d = codecs.decode(codecs.encode(g, "jpg"), "jpg")
    assert d.shape == g.shape
    assert codecs.psnr(g, d) >= 40.0

    # re-encode fixpoint (the invariant check's lossy condition) holds even
    # on pure noise — requantizing already-quantized coefficients is gentle
    noise = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    first = codecs.decode(codecs.encode(noise, "jpeg"), "jpeg")
    again = codecs.decode(codecs.encode(first, "jpeg"), "jpeg")
    assert codecs.psnr(first, again) >= 40.0


def test_jpeg_decodes_hand_assembled_fixture():
    """A minimal baseline JPEG assembled BYTE-BY-BYTE from the T.81 spec
    (not produced by our encoder): 8x8 grayscale, all-ones quant table,
    single DC coefficient 16 -> every pixel 130."""
    from customer_er_spark.jpeg import jpeg_decode

    fixture = bytes(
        [0xFF, 0xD8]                                    # SOI
        + [0xFF, 0xDB, 0x00, 0x43, 0x00] + [1] * 64     # DQT id0, all ones
        + [0xFF, 0xC0, 0x00, 0x0B, 0x08,                # SOF0: depth 8
           0x00, 0x08, 0x00, 0x08, 0x01,                # 8x8, 1 component
           0x01, 0x11, 0x00]                            # id1, 1x1, qt0
        + [0xFF, 0xC4, 0x00, 0x14, 0x00,                # DHT DC0:
           1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
           0x05]                                        # one 1-bit code -> cat 5
        + [0xFF, 0xC4, 0x00, 0x14, 0x10,                # DHT AC0:
           1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
           0x00]                                        # one 1-bit code -> EOB
        + [0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00]  # SOS
        # scan: DC code '0', magnitude 16 = '10000', EOB '0', pad '1'
        + [0b01000001]
        + [0xFF, 0xD9]                                  # EOI
    )
    img = jpeg_decode(fixture)
    assert img.shape == (8, 8)
    assert (img == 130).all(), img


def test_jpeg_rejects_unsupported_modes(rng):
    from customer_er_spark.jpeg import jpeg_decode, jpeg_encode

    data = bytearray(jpeg_encode(rng.integers(0, 256, (8, 8), dtype=np.uint8)))
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    data[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive|unsupported"):
        jpeg_decode(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg at all")


def test_wav_roundtrip_exact(rng):
    from customer_er_spark.audio import decode_wav, encode_wav

    t = np.arange(4410)
    stereo = np.stack(
        [
            (10000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int64),
            (rng.integers(-32768, 32768, len(t))).astype(np.int64),
        ],
        axis=1,
    )
    blob = encode_wav(stereo, 44100)
    samples, rate = decode_wav(blob)
    assert rate == 44100 and samples.shape == (4410, 2)
    assert (samples == stereo).all()  # 16-bit PCM roundtrip is bit-exact
    # deterministic encoder: same samples -> same bytes
    assert encode_wav(samples, rate) == blob
    with pytest.raises(Exception):
        decode_wav(b"RIFFnot really a wav")


def test_jpeg_rejects_non_interleaved_scan(rng):
    from customer_er_spark.jpeg import jpeg_decode, jpeg_encode

    data = bytearray(jpeg_encode(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
    sos = data.find(b"\xff\xda")
    assert sos > 0
    # claim a 1-component scan in a 3-component SOF (non-interleaved file);
    # must be rejected, not silently decoded as garbage
    data[sos + 4] = 1
    with pytest.raises(ValueError, match="non-interleaved"):
        jpeg_decode(bytes(data))


def test_audio_meta_operator(spark, rng):
    from customer_er_spark.audio import encode_wav
    from customer_er_spark.operators.multimodal import audio_meta

    mono = (1000 * np.sin(np.linspace(0, 40, 8000))).astype(np.int64)[:, None]
    rows = [
        ("w1", bytearray(encode_wav(mono, 8000)), "wav"),
        ("w2", bytearray(b"garbage bytes"), "wav"),
        ("m1", bytearray(b"\xff\xfb fake mp3"), "mp3"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = {r["audio_id"]: r for r in audio_meta(df).collect()}
    ok = out["w1"]
    assert ok["ok"] and ok["sample_rate"] == 8000 and ok["channels"] == 1
    assert ok["n_samples"] == 8000 and ok["duration_s"] == 1.0 and ok["rms"] > 0
    assert not out["w2"]["ok"] and not out["m1"]["ok"]


def test_mp4_parse_roundtrip():
    """build_minimal_mp4 -> parse_mp4 recovers every field the sampler
    needs: movie/track duration, dims, frame count, keyframe indices."""
    from customer_er_spark.mp4 import build_minimal_mp4, parse_mp4, sample_table

    data = build_minimal_mp4(
        n_frames=90, fps=30, width=64, height=48, keyframe_every=30
    )
    m = parse_mp4(data)
    assert m.brands == "isom" and m.duration_s == pytest.approx(3.0)
    (tr,) = m.tracks
    assert (tr.track_id, tr.width, tr.height) == (1, 64.0, 48.0)
    assert tr.n_samples == 90 and tr.duration_s == pytest.approx(3.0)
    st = sample_table(tr)
    assert len(st) == 90
    assert st[1] == (1, pytest.approx(1 / 30), False)
    assert [i for i, _, s in st if s] == [0, 30, 60]
    # malformed payloads raise (operators map this to ok=false / zero rows)
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 40)
    with pytest.raises(ValueError):
        parse_mp4(data[: len(data) // 3])  # truncated mid-box


def test_video_meta_and_frame_sample_operators(spark):
    from customer_er_spark.mp4 import build_minimal_mp4
    from customer_er_spark.operators.multimodal import frame_sample, video_meta

    rows = [
        ("v1", bytearray(build_minimal_mp4(n_frames=60, fps=30,
                                           keyframe_every=20))),
        ("v2", bytearray(build_minimal_mp4(n_frames=10, fps=5, width=32,
                                           height=32, keyframe_every=4))),
        ("bad", bytearray(b"not an mp4 payload at all...")),
    ]
    vids = spark.createDataFrame(rows, "video_id string, bytes binary")

    meta = {r["video_id"]: r for r in video_meta(vids).collect()}
    assert meta["v1"]["ok"] and meta["v1"]["n_frames"] == 60
    assert meta["v1"]["n_keyframes"] == 3  # frames 1, 21, 41
    assert meta["v2"]["width"] == 32 and meta["v2"]["duration_s"] == \
        pytest.approx(2.0)
    assert not meta["bad"]["ok"]  # poison-safe, no stage failure

    # every-n sampling with REAL timestamps from stts
    sampled = frame_sample(vids, every_n=30).collect()
    by_vid = {}
    for r in sampled:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert [r["frame_idx"] for r in by_vid["v1"]] == [0, 30]
    assert by_vid["v1"][1]["t_seconds"] == pytest.approx(1.0)
    assert "bad" not in by_vid  # zero rows for poison input

    # keyframe-only sampling indexes the stss table
    syncs = frame_sample(vids, sync_only=True).collect()
    v2_syncs = [r["frame_idx"] for r in syncs if r["video_id"] == "v2"]
    assert v2_syncs == [0, 4, 8]
    assert all(r["is_sync"] for r in syncs)


def test_mp4_version1_boxes():
    """64-bit (version-1) mvhd/tkhd/mdhd layouts parse correctly, and a
    track without an stss box treats every sample as a sync sample."""
    import struct

    from customer_er_spark.mp4 import parse_mp4, sample_table, _box

    ts, dur, n = 6000, 12000, 24
    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxQQIQ", 1, 0, 0, ts, dur)
        + struct.pack(">hhi", 0x0100, 0, 0)
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        # v1: creation8 mod8 id4 res4 dur8, res8, layer/alt/vol/res 8,
        # matrix 36, width/height 16.16
        struct.pack(">BxxxQQIxxxxQ", 1, 0, 0, 7, dur)
        + b"\x00" * 8
        + struct.pack(">hhhxx", 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 320 << 16, 200 << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">BxxxQQIQ", 1, 0, 0, ts, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    stts = _box(
        b"stts", struct.pack(">BxxxI", 0, 1) + struct.pack(">II", n, dur // n)
    )
    stbl = _box(b"stbl", stts)  # NO stss: all samples are sync per spec
    trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + _box(b"minf", stbl)))
    data = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(b"moov", mvhd + trak)

    m = parse_mp4(data)
    assert m.timescale == ts and m.duration == dur
    (tr,) = m.tracks
    assert tr.track_id == 7
    assert (tr.width, tr.height) == (320.0, 200.0)  # v1 dims at +84
    assert tr.timescale == ts and tr.n_samples == n
    st = sample_table(tr)
    assert len(st) == n and all(sync for _, _, sync in st)
    assert st[-1][1] == pytest.approx((n - 1) * (dur // n) / ts)


def _planted_frames(n=12, w=64, h=48, seed=7):
    """JPEG-friendly deterministic frames: smooth per-frame gradients (the
    content class where a quality-92 baseline JPEG clears PSNR >= 40dB)."""
    rng = np.random.default_rng(seed)
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        base = np.stack(
            [
                (xx * 255 / (w - 1) + i * 9) % 256,
                (yy * 255 / (h - 1) + i * 5) % 256,
                ((xx + yy) * 255 / (w + h - 2) + i * 3) % 256,
            ],
            axis=-1,
        )
        frames.append(
            np.clip(base + rng.normal(0, 2, base.shape), 0, 255).astype(np.uint8)
        )
    return frames


def test_mjpeg_mp4_pixel_roundtrip():
    """r6 verdict #6: a synthesized MJPEG-in-MP4 decodes back to the
    planted pixels through the container's OWN sample tables (stsd fourcc,
    stsz/stsc/stco byte ranges) at PSNR >= 40dB per frame — the
    BASELINE.json lossy-decode invariant applied to video."""
    from customer_er_spark.codecs import psnr
    from customer_er_spark.jpeg import jpeg_decode
    from customer_er_spark.mp4 import (
        build_mjpeg_mp4,
        parse_mp4,
        sample_ranges,
        sample_table,
    )

    frames = _planted_frames()
    data = build_mjpeg_mp4(frames, fps=30, keyframe_every=5, quality=92)
    m = parse_mp4(data)
    (tr,) = m.tracks
    assert tr.codec == "jpeg"
    assert tr.n_samples == len(frames)
    ranges = sample_ranges(tr)
    assert len(ranges) == len(frames)
    st = sample_table(tr)
    assert [i for i, _, s in st if s] == list(range(0, len(frames), 5))
    for i, (off, size) in enumerate(ranges):
        img = jpeg_decode(data[off : off + size])
        assert img.shape == frames[i].shape
        p = psnr(frames[i], img)
        assert p >= 40.0, (i, p)


def test_frame_pixels_operator(spark):
    """frame_pixels: sampled frames come back as raw RGB with true
    timestamps; per-sample corruption yields ok=false for that row only;
    non-MP4 bytes and metadata-only skeletons yield zero rows."""
    from customer_er_spark.mp4 import (
        build_minimal_mp4,
        build_mjpeg_mp4,
        parse_mp4,
        sample_ranges,
    )
    from customer_er_spark.operators.multimodal import frame_pixels

    frames = _planted_frames(n=10)
    good = build_mjpeg_mp4(frames, fps=30, keyframe_every=5)
    # corrupt exactly sample 0's payload in a second copy
    m = parse_mp4(good)
    off, size = sample_ranges(m.tracks[0])[0]
    bad_sample = bytearray(good)
    bad_sample[off + 2 : off + size] = b"\x00" * (size - 2)
    vids = spark.createDataFrame(
        [
            ("ok", bytearray(good)),
            ("poison", bytearray(b"not an mp4 at all")),
            ("skeleton", bytearray(build_minimal_mp4(n_frames=9))),
            ("halfbad", bad_sample),
        ],
        "video_id string, bytes binary",
    )
    out = frame_pixels(vids, every_n=5).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert "poison" not in by_vid and "skeleton" not in by_vid
    oks = sorted(by_vid["ok"], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in oks] == [0, 5]
    assert all(r["ok"] for r in oks)
    img0 = np.frombuffer(oks[0]["pixels"], np.uint8).reshape(
        oks[0]["h"], oks[0]["w"], 3
    )
    from customer_er_spark.codecs import psnr

    assert psnr(frames[0], img0) >= 40.0
    assert oks[1]["t_seconds"] == pytest.approx(5 / 30)
    hb = sorted(by_vid["halfbad"], key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], r["ok"]) for r in hb] == [(0, False), (5, True)]
    assert hb[0]["pixels"] is None


def test_solid_jpeg_closed_form():
    """Pins the frame_pixels_solid oracle's assumptions: quality 92 scales
    both quant tables' [0][0] to 3; every color in the oracle schedule is
    TIE-FREE (no rounded intermediate within 1e-6 of .5 — where numpy's
    banker's rounding and SQL's half-away rounding would diverge); and the
    closed-form chain equals the REAL encoder+decoder output exactly."""
    from customer_er_spark.jpeg import (
        QT_CHROMA,
        QT_LUMA,
        jpeg_decode,
        jpeg_encode,
        scaled_quant_table,
    )

    assert scaled_quant_table(QT_LUMA, 92)[0, 0] == 3
    assert scaled_quant_table(QT_CHROMA, 92)[0, 0] == 3

    def solid(k):
        return ((k * 37 + 11) % 256, (k * 83 + 5) % 256, (k * 53 + 29) % 256)

    def closed_form(r, g, b, q=3):
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

        def dq(v):
            x = 8 * (v - 128) / q
            assert abs(x - np.floor(x) - 0.5) > 1e-6, ("dc tie", v, x)
            return q * np.round(x) / 8 + 128

        y2, cb2, cr2 = dq(y), dq(cb), dq(cr)
        rr = y2 + 1.402 * (cr2 - 128)
        gg = y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128)
        bb = y2 + 1.772 * (cb2 - 128)
        for x in (rr, gg, bb):
            assert abs(x - np.floor(x) - 0.5) > 1e-6, ("rgb tie", x)
        return tuple(int(np.clip(np.round(v), 0, 255)) for v in (rr, gg, bb))

    for k in range(120):  # the full oracle schedule (12 videos x 10 frames)
        r, g, b = solid(k)
        want = closed_form(r, g, b)
        dec = jpeg_decode(
            jpeg_encode(np.full((16, 16, 3), (r, g, b), np.uint8), quality=92)
        )
        u = np.unique(dec.reshape(-1, 3), axis=0)
        assert len(u) == 1, (k, u[:4])  # DC-only decode is uniform
        assert tuple(int(x) for x in u[0]) == want, (k, want, u[0])
