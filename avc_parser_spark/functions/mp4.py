"""Minimal ISO-BMFF (MP4) container metadata parser + builder.

`parse_mp4_meta` walks the box tree (stdlib `struct` only, bounded depth /
box count / size caps) and extracts container-level metadata: movie
duration + timescale (mvhd) and, per track, handler kind (hdlr), codec
fourcc (first stsd sample entry), presentation dimensions (tkhd 16.16
fixed), media timescale/duration (mdhd) and sample count (stsz). It does
NOT decode frames — avc1/mp4a bitstreams need codecs this container does
not ship — but container metadata is lossless and exact, which is what a
100 TB crawl pipeline needs first anyway: route/filter video payloads by
duration/dimensions/codec BEFORE paying for any frame decode.

`build_mp4` constructs a small spec-shaped file (ftyp + moov{mvhd, trak*}
+ mdat) for planted payloads and roundtrip tests.

The reference repo has no media pipeline at all (grepped: zero hits for
mp4/moov); this module serves the multimodal extension of SURVEY §2, same
slot as the PPM/PNG/GIF/JPEG/WAV kernels in multimodal.py.
"""

from __future__ import annotations

import struct

# Hard caps: a crafted size field must never drive unbounded work.
_MAX_BOXES = 10_000
_MAX_DEPTH = 8
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(payload: bytes, start: int, end: int, depth: int, budget: list[int]):
    """Yield (box_type, body_start, body_end) for boxes in [start, end);
    recurse into container boxes, yielding children after their parent."""
    i = start
    while i + 8 <= end:
        if budget[0] <= 0:
            return
        budget[0] -= 1
        size, btype = struct.unpack_from(">I4s", payload, i)
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", payload, i + 8)
            body = i + 16
        elif size == 0:
            size = end - i
        if size < body - i or i + size > end:
            return  # malformed/truncated box: stop this level
        yield btype, body, i + size
        if btype in _CONTAINERS and depth < _MAX_DEPTH:
            yield from _walk(payload, body, i + size, depth + 1, budget)
        i += size


def _fullbox(payload: bytes, body: int) -> tuple[int, int]:
    """(version, offset past version+flags)."""
    return payload[body], body + 4


def parse_mp4_meta(payload: bytes) -> dict | None:
    """Parse container metadata; None unless the payload is a plausible
    ISO-BMFF file (ftyp box first) with a readable moov/mvhd."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    timescale = duration = None
    tracks: list[dict] = []
    cur: dict | None = None
    budget = [_MAX_BOXES]
    try:
        for btype, body, bend in _walk(payload, 0, len(payload), 0, budget):
            if btype == b"mvhd":
                ver, off = _fullbox(payload, body)
                if ver == 1:
                    timescale, duration = struct.unpack_from(
                        ">IQ", payload, off + 16
                    )
                else:
                    timescale, duration = struct.unpack_from(
                        ">II", payload, off + 8
                    )
            elif btype == b"trak":
                cur = {
                    "kind": None,
                    "codec": None,
                    "width": None,
                    "height": None,
                    "timescale": None,
                    "duration": None,
                    "n_samples": 0,
                }
                tracks.append(cur)
            elif cur is not None and btype == b"tkhd":
                ver, off = _fullbox(payload, body)
                woff = off + (32 if ver == 1 else 20) + 52
                w, h = struct.unpack_from(">II", payload, woff)
                cur["width"], cur["height"] = w >> 16, h >> 16
            elif cur is not None and btype == b"mdhd":
                ver, off = _fullbox(payload, body)
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, off + 16)
                else:
                    ts, dur = struct.unpack_from(">II", payload, off + 8)
                cur["timescale"], cur["duration"] = ts, dur
            elif cur is not None and btype == b"hdlr":
                cur["kind"] = payload[body + 8 : body + 12].decode(
                    "latin-1", "replace"
                )
            elif cur is not None and btype == b"stsd":
                (n_entries,) = struct.unpack_from(">I", payload, body + 4)
                if n_entries and body + 16 <= bend:
                    cur["codec"] = payload[body + 12 : body + 16].decode(
                        "latin-1", "replace"
                    )
            elif cur is not None and btype == b"stsz":
                (cur["n_samples"],) = struct.unpack_from(">I", payload, body + 8)
    except (struct.error, IndexError):
        return None
    if timescale is None or not timescale:
        return None
    return {
        "timescale": timescale,
        "duration": duration or 0,
        "duration_sec": (duration or 0) / timescale,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


# --------------------------------------------------------------------------
# Builder (plants / tests only)


def _box(btype: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I4s", 8 + len(body), btype) + body


def _sample_entry(codec: str, width: int | None, height: int | None) -> bytes:
    base = b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
    if width is not None:
        # visual sample entry: pre_defined/reserved (16) + w/h + resolution
        # + reserved + frame_count + compressorname(32) + depth + pre_defined
        base += (
            b"\x00" * 16
            + struct.pack(">HH", width, height or 0)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + b"\x00" * 4
            + struct.pack(">H", 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 24, -1)
        )
    return _box(codec.encode("ascii"), base)


def build_mp4(
    duration_sec: float, timescale: int, tracks: list[dict]
) -> bytes:
    """Assemble a minimal valid MP4. Each track dict: kind ('vide'/'soun'),
    codec fourcc, width/height (video only), n_samples."""
    dur = int(round(duration_sec * timescale))
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isomiso2avc1mp41")
    mvhd = _box(
        b"mvhd",
        b"\x00" * 4  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", len(tracks) + 1),  # next_track_ID
    )
    traks = []
    for idx, t in enumerate(tracks):
        w, h = t.get("width"), t.get("height")
        tkhd = _box(
            b"tkhd",
            b"\x00\x00\x00\x07"  # version 0, flags: enabled|in_movie|preview
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", idx + 1)  # track_ID
            + b"\x00" * 4
            + struct.pack(">I", dur)
            + b"\x00" * 8
            + struct.pack(">hhh", 0, 0, 0x0100 if w is None else 0)
            + b"\x00" * 2
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", (w or 0) << 16, (h or 0) << 16),
        )
        mdhd = _box(
            b"mdhd",
            b"\x00" * 4
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _box(
            b"hdlr",
            b"\x00" * 8
            + t["kind"].encode("ascii")
            + b"\x00" * 12
            + b"avc\x00",
        )
        n = int(t.get("n_samples", 0))
        stbl = _box(
            b"stbl",
            _box(
                b"stsd",
                b"\x00" * 4 + struct.pack(">I", 1),
                _sample_entry(t["codec"], w, h),
            ),
            _box(
                b"stts",
                b"\x00" * 4
                + struct.pack(">I", 1)
                + struct.pack(">II", n, max(dur // max(n, 1), 1)),
            ),
            _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, n)),
            _box(b"stsc", b"\x00" * 4 + struct.pack(">I", 0)),
            _box(b"stco", b"\x00" * 4 + struct.pack(">I", 0)),
        )
        minf = _box(b"minf", stbl)
        traks.append(_box(b"trak", tkhd, _box(b"mdia", mdhd, hdlr, minf)))
    moov = _box(b"moov", mvhd, *traks)
    mdat = _box(b"mdat", b"\x00" * 8)
    return ftyp + moov + mdat
