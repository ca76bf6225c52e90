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

`parse_mp4` walks that tree with bounds checks (poison rows return errors,
never crash a stage); `sample_table` expands stts/stss into frame
(index, t_seconds, is_sync) rows; `build_minimal_mp4` constructs a tiny
deterministic but spec-shaped file for tests and datagen.

Frame PIXELS stay honestly out of scope: sample data in `mdat` is
codec-encoded (avc1/hevc), and decoding it requires the very libraries
this container lacks.  The operators in operators/multimodal.py surface
everything up to that boundary.
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
