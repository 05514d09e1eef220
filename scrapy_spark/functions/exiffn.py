"""EXIF (APP1/TIFF) metadata — build, parse, scrub — from scratch.

The LAION/DataComp curation step the reference gets from PIL
(``Image._getexif`` via content_handlers.py image handling): camera EXIF
carries privacy-sensitive fields (GPS position, timestamps, device ids),
so large-scale image pipelines extract what they need (orientation for
correct decode, capture time for freshness) and STRIP the segment before
redistribution. Both directions here are byte-level: parsing walks the
TIFF IFD tree inside the APP1 payload; scrubbing splices marker segments
out of the JPEG container without touching entropy data (no transcode, no
generation loss).

Implements the public specs only: TIFF 6.0 IFD layout, EXIF 2.3 tag ids,
JFIF/JPEG marker framing (ITU T.81 B.2). Self-contained: numpy-free,
stdlib struct only.
"""

from __future__ import annotations

import struct

# tag ids (EXIF 2.3 / TIFF 6.0)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_DT_ORIGINAL = 0x9003
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


# --- builder ----------------------------------------------------------------


def _deg_to_dms(deg: float) -> list[tuple[int, int]]:
    """Decimal degrees -> ((d,1),(m,1),(s*10000,10000)) rationals."""
    d = int(deg)
    rem = (deg - d) * 60.0
    m = int(rem)
    s = round((rem - m) * 60.0 * 10000)
    return [(d, 1), (m, 1), (s, 10000)]


class _IfdBuilder:
    """One little-endian IFD: fixed 12-byte entries + an overflow data area.
    Offsets are patched relative to the TIFF header once the caller knows
    where this IFD lands."""

    def __init__(self):
        self.entries: list[tuple[int, int, int, bytes]] = []  # tag,type,count,payload

    def add(self, tag: int, typ: int, count: int, payload: bytes):
        self.entries.append((tag, typ, count, payload))

    def ascii(self, tag: int, s: str):
        raw = s.encode("ascii", "replace") + b"\x00"
        self.add(tag, 2, len(raw), raw)

    def short(self, tag: int, v: int):
        self.add(tag, 3, 1, struct.pack("<H", v))

    def long(self, tag: int, v: int):
        self.add(tag, 4, 1, struct.pack("<I", v))

    def rationals(self, tag: int, vals: list[tuple[int, int]]):
        self.add(tag, 5, len(vals), b"".join(struct.pack("<II", n, d) for n, d in vals))

    def size(self) -> int:
        return 2 + 12 * len(self.entries) + 4

    def render(self, ifd_offset: int) -> bytes:
        """Serialize at ``ifd_offset`` (from TIFF header start); overflow
        values land immediately after the entry table."""
        self.entries.sort(key=lambda e: e[0])  # spec: ascending tag order
        out = struct.pack("<H", len(self.entries))
        data = bytearray()
        data_base = ifd_offset + self.size()
        for tag, typ, count, payload in self.entries:
            out += struct.pack("<HHI", tag, typ, count)
            if len(payload) <= 4:
                out += payload.ljust(4, b"\x00")
            else:
                out += struct.pack("<I", data_base + len(data))
                data += payload
        out += struct.pack("<I", 0)  # no next IFD
        return out + bytes(data)


def build_exif(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    gps_lat: float | None = None,
    gps_lon: float | None = None,
) -> bytes:
    """Minimal valid APP1 Exif payload (``Exif\\0\\0`` + little-endian TIFF
    with IFD0 [+ Exif IFD when datetime set, + GPS IFD when lat/lon set])."""
    ifd0 = _IfdBuilder()
    if make is not None:
        ifd0.ascii(TAG_MAKE, make)
    if model is not None:
        ifd0.ascii(TAG_MODEL, model)
    if orientation is not None:
        ifd0.short(TAG_ORIENTATION, orientation)
    if datetime is not None:
        ifd0.ascii(TAG_DATETIME, datetime)

    exif_ifd = gps_ifd = None
    if datetime is not None:
        exif_ifd = _IfdBuilder()
        exif_ifd.ascii(TAG_DT_ORIGINAL, datetime)
    if gps_lat is not None and gps_lon is not None:
        gps_ifd = _IfdBuilder()
        gps_ifd.ascii(TAG_GPS_LAT_REF, "N" if gps_lat >= 0 else "S")
        gps_ifd.rationals(TAG_GPS_LAT, _deg_to_dms(abs(gps_lat)))
        gps_ifd.ascii(TAG_GPS_LON_REF, "E" if gps_lon >= 0 else "W")
        gps_ifd.rationals(TAG_GPS_LON, _deg_to_dms(abs(gps_lon)))

    # reserve pointer slots, then lay out: IFD0, Exif IFD, GPS IFD
    if exif_ifd is not None:
        ifd0.long(TAG_EXIF_IFD, 0)
    if gps_ifd is not None:
        ifd0.long(TAG_GPS_IFD, 0)
    ifd0_off = 8
    pos = ifd0_off + len(ifd0.render(ifd0_off))
    if exif_ifd is not None:
        for i, (tag, typ, count, _p) in enumerate(ifd0.entries):
            if tag == TAG_EXIF_IFD:
                ifd0.entries[i] = (tag, typ, count, struct.pack("<I", pos))
        pos += len(exif_ifd.render(pos))
    if gps_ifd is not None:
        for i, (tag, typ, count, _p) in enumerate(ifd0.entries):
            if tag == TAG_GPS_IFD:
                ifd0.entries[i] = (tag, typ, count, struct.pack("<I", pos))
    tiff = b"II*\x00" + struct.pack("<I", ifd0_off)
    body = ifd0.render(ifd0_off)
    if exif_ifd is not None:
        body += exif_ifd.render(ifd0_off + len(body))
    if gps_ifd is not None:
        body += gps_ifd.render(ifd0_off + len(body))
    return b"Exif\x00\x00" + tiff + body


def insert_exif(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Splice an APP1 segment into a JPEG right after SOI (+APP0 if
    present). Byte splice only — entropy data untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    if jpeg[pos : pos + 2] == b"\xff\xe0":  # keep APP0 first (JFIF rule)
        (ln,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        pos += 2 + ln
    seg = b"\xff\xe1" + struct.pack(">H", 2 + len(exif_payload)) + exif_payload
    return jpeg[:pos] + seg + jpeg[pos:]


# --- parser -----------------------------------------------------------------


def _read_ifd(tiff: bytes, off: int, endian: str) -> dict[int, tuple[int, int, bytes]]:
    """IFD at ``off`` -> {tag: (type, count, raw value bytes)}."""
    out: dict[int, tuple[int, int, bytes]] = {}
    if off + 2 > len(tiff):
        return out
    (n,) = struct.unpack_from(endian + "H", tiff, off)
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            break
        tag, typ, count = struct.unpack_from(endian + "HHI", tiff, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = tiff[base + 8 : base + 8 + size]
        else:
            (voff,) = struct.unpack_from(endian + "I", tiff, base + 8)
            raw = tiff[voff : voff + size]
        out[tag] = (typ, count, raw)
    return out


def _ascii(entry) -> str | None:
    if entry is None:
        return None
    return entry[2].split(b"\x00")[0].decode("ascii", "replace")


def _short(entry, endian) -> int | None:
    if entry is None or len(entry[2]) < 2:
        return None
    return struct.unpack_from(endian + "H", entry[2])[0]


def _dms_to_deg(entry, endian) -> float | None:
    if entry is None or entry[0] != 5 or entry[1] < 3 or len(entry[2]) < 24:
        return None
    vals = []
    for i in range(3):
        n, d = struct.unpack_from(endian + "II", entry[2], 8 * i)
        vals.append(n / d if d else 0.0)
    return vals[0] + vals[1] / 60.0 + vals[2] / 3600.0


def parse_exif(payload: bytes) -> dict | None:
    """APP1 payload (with or without the ``Exif\\0\\0`` prefix) -> dict of
    the pipeline-relevant fields; None when it isn't EXIF."""
    if payload.startswith(b"Exif\x00\x00"):
        tiff = payload[6:]
    else:
        tiff = payload
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        return None
    endian = "<" if tiff[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(endian + "H", tiff, 2)
    if magic != 42:
        return None
    (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, ifd0_off, endian)
    out = {
        "make": _ascii(ifd0.get(TAG_MAKE)),
        "model": _ascii(ifd0.get(TAG_MODEL)),
        "orientation": _short(ifd0.get(TAG_ORIENTATION), endian),
        "datetime": _ascii(ifd0.get(TAG_DATETIME)),
        "gps_lat": None,
        "gps_lon": None,
        "has_gps": False,
    }
    gps_ptr = ifd0.get(TAG_GPS_IFD)
    if gps_ptr is not None and len(gps_ptr[2]) >= 4:
        (goff,) = struct.unpack_from(endian + "I", gps_ptr[2])
        gps = _read_ifd(tiff, goff, endian)
        if gps:
            out["has_gps"] = True
            lat = _dms_to_deg(gps.get(TAG_GPS_LAT), endian)
            lon = _dms_to_deg(gps.get(TAG_GPS_LON), endian)
            if lat is not None and _ascii(gps.get(TAG_GPS_LAT_REF)) == "S":
                lat = -lat
            if lon is not None and _ascii(gps.get(TAG_GPS_LON_REF)) == "W":
                lon = -lon
            out["gps_lat"] = lat
            out["gps_lon"] = lon
    exif_ptr = ifd0.get(TAG_EXIF_IFD)
    if exif_ptr is not None and len(exif_ptr[2]) >= 4 and out["datetime"] is None:
        (eoff,) = struct.unpack_from(endian + "I", exif_ptr[2])
        sub = _read_ifd(tiff, eoff, endian)
        out["datetime"] = _ascii(sub.get(TAG_DT_ORIGINAL))
    return out


# --- JPEG container walk ----------------------------------------------------


def _jpeg_segments(data: bytes):
    """Yield (marker, seg_start, seg_end) for each header segment up to SOS;
    entropy data and everything after is left to the caller."""
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional 0xFF fill bytes pad markers
            pos += 1
            continue
        if marker == 0xD9:
            return
        if marker == 0xDA:  # SOS: header segment then entropy follows
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            yield marker, pos, pos + 2 + ln
            return
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln


def extract_jpeg_exif(data: bytes) -> dict | None:
    """First APP1 Exif segment's parsed fields, or None."""
    if data[:2] != b"\xff\xd8":
        return None
    for marker, s, e in _jpeg_segments(data):
        if marker == 0xE1 and data[s + 4 : s + 10] == b"Exif\x00\x00":
            return parse_exif(data[s + 4 : e])
    return None


def strip_jpeg_metadata(data: bytes) -> bytes:
    """Remove every metadata segment a curation pipeline shouldn't ship —
    APP1..APP15 (EXIF, XMP, ICC, ...) and COM comments — keeping APP0/JFIF
    and all coding segments. Pure byte splice: the entropy-coded data is
    bit-identical, so decoded pixels cannot change (no generation loss)."""
    if data[:2] != b"\xff\xd8":
        return data
    drop: list[tuple[int, int]] = []
    for marker, s, e in _jpeg_segments(data):
        if (0xE1 <= marker <= 0xEF) or marker == 0xFE:  # APPn>0 / COM
            drop.append((s, e))
    if not drop:
        return data
    out = bytearray()
    prev = 0
    for s, e in drop:
        out += data[prev:s]
        prev = e
    out += data[prev:]
    return bytes(out)


# --- orientation ------------------------------------------------------------


def apply_exif_orientation(pixels, orientation: int):
    """Apply the EXIF orientation tag to decoded (h, w, 3) pixels: the 8
    spec cases (1 = as-is; 2/4/5/7 mirrored; 3 = 180deg; 6/8 = 90deg)."""
    import numpy as np

    px = np.asarray(pixels)
    if orientation in (2,):
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1, :]
    if orientation == 5:
        return px.transpose(1, 0, 2)
    if orientation == 6:
        return np.rot90(px, k=3)
    if orientation == 7:
        # transverse: out[i, j] = px[H-1-j, W-1-i] (NOT the plain transpose)
        return np.rot90(px, k=3)[::-1, :]
    if orientation == 8:
        return np.rot90(px, k=1)
    return px
