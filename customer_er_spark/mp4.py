"""Pure-stdlib MP4 (ISO BMFF) box parsing — container metadata only.

Makes the video path's Spark plumbing real without a pixel decoder (no
external codec libraries exist in this container, and none are needed to
read the CONTAINER): an MP4 file is a tree of length-prefixed boxes
([u32 size][4cc type][payload]), and everything a sampling/metadata
operator needs lives in `moov`:

    mvhd            movie timescale + duration
    trak/tkhd       track id, presentation width/height (16.16 fixed)
    trak/mdia/mdhd  per-track media timescale + duration
    trak/.../stbl/stts   time-to-sample table: run-length (count, delta)
                         pairs -> the number of samples (frames) and the
                         timestamp of each
    trak/.../stbl/stss   sync-sample table: 1-based indices of keyframes
                         (absent => every sample is a sync sample)

    trak/.../stbl/stsd   sample description: codec fourcc
    trak/.../stbl/stsz + stsc + stco
                         per-sample sizes + sample-to-chunk runs + chunk
                         offsets -> each sample's absolute byte range

`parse_mp4` walks that tree with bounds checks (poison rows return errors,
never crash a stage); `sample_table` expands stts/stss into frame
(index, t_seconds, is_sync) rows; `sample_ranges` resolves each sample's
byte range; `build_minimal_mp4` constructs a tiny deterministic
metadata-only skeleton for tests and datagen.

Frame PIXELS: `build_mjpeg_mp4` writes a real MJPEG track (every sample an
independent baseline JPEG, stsd fourcc 'jpeg'), which the repo's pure-numpy
JPEG codec (customer_er_spark.jpeg) decodes back to pixels — so
operators/multimodal.frame_pixels is a REAL video->pixels path with no
external codec libraries.  Inter-frame codecs (avc1/hevc) remain honestly
out of scope: decoding them needs the libraries this container lacks, and
frame_pixels marks such samples ok=false instead of crashing.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end); stops on malformed sizes."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", data, off)[0]
        btype = data[off + 4 : off + 8]
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            size = struct.unpack_from(">Q", data, off + 8)[0]
            payload = off + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
            payload = off + 8
        else:
            payload = off + 8
        if size < payload - off or off + size > end:
            return  # malformed: truncated or overlapping box
        yield btype, payload, off + size
        off += size


@dataclass
class Mp4Track:
    track_id: int = 0
    width: float = 0.0
    height: float = 0.0
    timescale: int = 0
    duration: int = 0
    stts: list[tuple[int, int]] = field(default_factory=list)
    stss: list[int] | None = None  # None => every sample is sync
    codec: str = ""  # stsd entry fourcc ("jpeg", "avc1", ...)
    stsz: list[int] = field(default_factory=list)  # per-sample byte sizes
    stsc: list[tuple[int, int, int]] = field(default_factory=list)
    #      (first_chunk, samples_per_chunk, desc_idx), 1-based per spec
    stco: list[int] = field(default_factory=list)  # absolute chunk offsets

    @property
    def n_samples(self) -> int:
        return sum(c for c, _ in self.stts)

    @property
    def duration_s(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0


@dataclass
class Mp4Meta:
    timescale: int = 0
    duration: int = 0
    tracks: list[Mp4Track] = field(default_factory=list)
    brands: str = ""

    @property
    def duration_s(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0


def parse_mp4(data: bytes) -> Mp4Meta:
    """Parse container metadata; raises ValueError on a non-MP4 payload."""
    meta = Mp4Meta()
    saw_moov = False
    for btype, p, q in _iter_boxes(data, 0, len(data)):
        if btype == b"ftyp":
            meta.brands = data[p : p + 4].decode("ascii", "replace")
        elif btype == b"moov":
            saw_moov = True
            _parse_moov(data, p, q, meta)
    if not saw_moov:
        raise ValueError("not an MP4: no moov box")
    return meta


def _fullbox(data: bytes, p: int) -> tuple[int, int]:
    """(version, payload offset past version/flags)."""
    return data[p], p + 4


def _parse_moov(data: bytes, start: int, end: int, meta: Mp4Meta) -> None:
    for btype, p, q in _iter_boxes(data, start, end):
        if btype == b"mvhd":
            ver, p0 = _fullbox(data, p)
            if ver == 1:
                _c, _m, ts, dur = struct.unpack_from(">QQIQ", data, p0)
            else:
                _c, _m, ts, dur = struct.unpack_from(">IIII", data, p0)
            meta.timescale, meta.duration = ts, dur
        elif btype == b"trak":
            meta.tracks.append(_parse_trak(data, p, q))


def _parse_trak(data: bytes, start: int, end: int) -> Mp4Track:
    tr = Mp4Track()
    for btype, p, q in _iter_boxes(data, start, end):
        if btype == b"tkhd":
            ver, p0 = _fullbox(data, p)
            # after version/flags: v0 = creation4 mod4 id4 res4 dur4 (20)
            # res8 (28) layer2 alt2 vol2 res2 (36) matrix36 -> dims at +72;
            # v1 widens the two times and duration to 8 bytes (+12) -> +84
            if ver == 1:
                tr.track_id = struct.unpack_from(">I", data, p0 + 16)[0]
                dims_off = p0 + 84
            else:
                tr.track_id = struct.unpack_from(">I", data, p0 + 8)[0]
                dims_off = p0 + 72
            w, h = struct.unpack_from(">II", data, dims_off)
            tr.width, tr.height = w / 65536.0, h / 65536.0  # 16.16 fixed
        elif btype == b"mdia":
            _parse_mdia(data, p, q, tr)
    return tr


def _parse_mdia(data: bytes, start: int, end: int, tr: Mp4Track) -> None:
    for btype, p, q in _iter_boxes(data, start, end):
        if btype == b"mdhd":
            ver, p0 = _fullbox(data, p)
            if ver == 1:
                _c, _m, ts, dur = struct.unpack_from(">QQIQ", data, p0)
            else:
                _c, _m, ts, dur = struct.unpack_from(">IIII", data, p0)
            tr.timescale, tr.duration = ts, dur
        elif btype == b"minf":
            for b2, p2, q2 in _iter_boxes(data, p, q):
                if b2 == b"stbl":
                    _parse_stbl(data, p2, q2, tr)


def _parse_stbl(data: bytes, start: int, end: int, tr: Mp4Track) -> None:
    for btype, p, _q in _iter_boxes(data, start, end):
        if btype == b"stts":
            _, p0 = _fullbox(data, p)
            n = struct.unpack_from(">I", data, p0)[0]
            tr.stts = [
                struct.unpack_from(">II", data, p0 + 4 + 8 * i) for i in range(n)
            ]
        elif btype == b"stss":
            _, p0 = _fullbox(data, p)
            n = struct.unpack_from(">I", data, p0)[0]
            tr.stss = [
                struct.unpack_from(">I", data, p0 + 4 + 4 * i)[0] for i in range(n)
            ]
        elif btype == b"stsd":
            # first sample description's fourcc identifies the codec
            _, p0 = _fullbox(data, p)
            n = struct.unpack_from(">I", data, p0)[0]
            if n >= 1:
                tr.codec = data[p0 + 8 : p0 + 12].decode("ascii", "replace")
        elif btype == b"stsz":
            _, p0 = _fullbox(data, p)
            uniform, n = struct.unpack_from(">II", data, p0)
            tr.stsz = (
                [uniform] * n
                if uniform
                else [
                    struct.unpack_from(">I", data, p0 + 8 + 4 * i)[0]
                    for i in range(n)
                ]
            )
        elif btype == b"stsc":
            _, p0 = _fullbox(data, p)
            n = struct.unpack_from(">I", data, p0)[0]
            tr.stsc = [
                struct.unpack_from(">III", data, p0 + 4 + 12 * i)
                for i in range(n)
            ]
        elif btype == b"stco":
            _, p0 = _fullbox(data, p)
            n = struct.unpack_from(">I", data, p0)[0]
            tr.stco = [
                struct.unpack_from(">I", data, p0 + 4 + 4 * i)[0]
                for i in range(n)
            ]


def sample_ranges(tr: Mp4Track) -> list[tuple[int, int]]:
    """Per-sample (absolute_offset, size) byte ranges from stsz+stsc+stco
    — the full chunk walk of ISO 14496-12 §8.7: for each chunk (stco
    offset), the stsc run in force gives its sample count; samples within
    a chunk are contiguous.  Returns [] when the table triple is absent or
    inconsistent (metadata-only skeletons), never raises."""
    if not (tr.stsz and tr.stsc and tr.stco):
        return []
    out: list[tuple[int, int]] = []
    n_chunks = len(tr.stco)
    si = 0
    for ci in range(n_chunks):
        # samples_per_chunk of the stsc entry in force for chunk ci+1
        spc = 0
        for first, count, _desc in tr.stsc:
            if first <= ci + 1:
                spc = count
            else:
                break
        off = tr.stco[ci]
        for _ in range(spc):
            if si >= len(tr.stsz):
                return out
            out.append((off, tr.stsz[si]))
            off += tr.stsz[si]
            si += 1
    return out


def sample_table(tr: Mp4Track) -> list[tuple[int, float, bool]]:
    """Expand stts/stss: one (sample_idx, t_seconds, is_sync) per sample.
    sample_idx is 0-based; stss entries are 1-based per spec."""
    sync = None if tr.stss is None else set(tr.stss)
    out, t, idx = [], 0, 0
    ts = tr.timescale or 1
    for count, delta in tr.stts:
        for _ in range(count):
            out.append((idx, t / ts, sync is None or (idx + 1) in sync))
            t += delta
            idx += 1
    return out


# ---------------------------------------------------------------------------
# minimal deterministic writer (tests + datagen fixtures)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_minimal_mp4(
    n_frames: int = 90,
    fps: int = 30,
    width: int = 64,
    height: int = 48,
    keyframe_every: int = 30,
    track_id: int = 1,
) -> bytes:
    """A spec-shaped single-video-track MP4 skeleton: real ftyp/moov box
    tree with consistent mvhd/tkhd/mdhd/stts/stss, plus an empty mdat.
    No codec payload — exactly the part of the format parse_mp4 reads."""
    timescale = fps * 100
    delta = 100
    duration = n_frames * delta

    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">hhi", 0x0100, 0, 0)  # rate/volume/reserved
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", track_id + 1),  # next_track_ID
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">BxxxIIIxxxxI", 0, 0, 0, track_id, duration)
        + b"\x00" * 8
        + struct.pack(">hhhxx", 0, 0, 0)  # layer/group/volume
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', quality
    )
    stts = _box(
        b"stts", struct.pack(">BxxxI", 0, 1) + struct.pack(">II", n_frames, delta)
    )
    keyframes = list(range(1, n_frames + 1, keyframe_every))
    stss = _box(
        b"stss",
        struct.pack(">BxxxI", 0, len(keyframes))
        + b"".join(struct.pack(">I", k) for k in keyframes),
    )
    stbl = _box(b"stbl", stts + stss)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    return ftyp + moov + _box(b"mdat", b"")


def _visual_sample_entry(fourcc: bytes, width: int, height: int) -> bytes:
    """ISO 14496-12 §12.1.3 VisualSampleEntry (the stsd child)."""
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)          # SampleEntry: dref idx
        + struct.pack(">HH", 0, 0) + b"\x00" * 12   # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi, 16.16
        + struct.pack(">I", 0)                        # reserved
        + struct.pack(">H", 1)                        # frame_count
        + b"\x00" * 32                                # compressorname
        + struct.pack(">Hh", 24, -1)                  # depth, pre_defined
    )
    return _box(fourcc, body)


def build_mjpeg_mp4(
    frames: list,
    fps: int = 30,
    keyframe_every: int = 10,
    quality: int = 92,
    track_id: int = 1,
) -> bytes:
    """MJPEG-in-MP4: a REAL pixel path with zero external codecs — every
    video sample in `mdat` is an independent baseline JPEG (stsd fourcc
    'jpeg', the Motion-JPEG-in-BMFF convention), encoded by the repo's own
    pure-numpy encoder (customer_er_spark.jpeg), so frame_pixels can
    decode sampled frames back to pixels and the PSNR>=40dB invariant of
    BASELINE.json applies to video exactly as it does to still images.

    `frames`: list of HxWx3 uint8 arrays (all the same shape).  Layout is
    the single-chunk contiguous form: stsc = one run covering all samples,
    stco = one offset (the mdat payload start, patched after the moov size
    is known), stsz = per-sample JPEG byte sizes."""
    import numpy as np

    from customer_er_spark.jpeg import jpeg_encode

    if not frames:
        raise ValueError("build_mjpeg_mp4 requires at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    payloads = [jpeg_encode(np.asarray(f), quality=quality) for f in frames]
    n_frames = len(payloads)
    timescale = fps * 100
    delta = 100
    duration = n_frames * delta

    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">hhi", 0x0100, 0, 0)
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", track_id + 1),
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">BxxxIIIxxxxI", 0, 0, 0, track_id, duration)
        + b"\x00" * 8
        + struct.pack(">hhhxx", 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    stsd = _box(
        b"stsd",
        struct.pack(">BxxxI", 0, 1) + _visual_sample_entry(b"jpeg", w, h),
    )
    stts = _box(
        b"stts", struct.pack(">BxxxI", 0, 1) + struct.pack(">II", n_frames, delta)
    )
    keyframes = list(range(1, n_frames + 1, keyframe_every))
    stss = _box(
        b"stss",
        struct.pack(">BxxxI", 0, len(keyframes))
        + b"".join(struct.pack(">I", k) for k in keyframes),
    )
    stsc = _box(
        b"stsc", struct.pack(">BxxxI", 0, 1) + struct.pack(">III", 1, n_frames, 1)
    )
    stsz = _box(
        b"stsz",
        struct.pack(">BxxxII", 0, 0, n_frames)
        + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )

    def _assemble(mdat_off: int) -> bytes:
        stco = _box(b"stco", struct.pack(">BxxxI", 0, 1) + struct.pack(">I", mdat_off))
        stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + minf)
        trak = _box(b"trak", tkhd + mdia)
        moov = _box(b"moov", mvhd + trak)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
        return ftyp + moov + _box(b"mdat", b"".join(payloads))

    # stco points into mdat, whose position depends on moov's size; a
    # fixed-width u32 offset keeps the size stable, so one re-assembly
    # with the measured offset converges
    probe = _assemble(0)
    header_len = len(probe) - (8 + sum(len(p) for p in payloads))
    return _assemble(header_len + 8)
