"""RAR 5.0 container reader, from scratch (SURVEY.md §2.9 X10 family —
the reference's ``Step3Unpacker.java:56-62`` lists ``rar`` among its
``PACKAGE_FORMAT_EXTS`` and unpacks it when a RAR-capable parser is in
the build).

Scope, and why it is bounded: the RAR *container layout* — signature,
vint-coded block headers, CRC32s, file metadata, data areas — is openly
published by the format's author (the "RAR 5.0 archive format" technote
distributed with WinRAR and on rarlab.com), so this module implements a
full RAR5 header walk from that public description: every member is
enumerated with name, declared sizes, compression info and data CRC, and
members stored WITHOUT compression (method 0) are extracted and
CRC-verified. The RAR *compression algorithm* itself has no public
specification — the only description is the unrar source, whose license
forbids using it to reimplement the algorithm — so compressed members
deliberately surface as ``unsupported`` status rows (same taxonomy as a
7z folder with a BCJ/AES coder chain), and that is the documented end
state, not a gap. Encrypted archives/members likewise.

RAR4 (``Rar!\\x1a\\x07\\x00``) keeps its detect-only handling upstream.

Bomb posture (the 7z lessons, round-4 ADVICE, applied from the start):
every count and size parsed from the header is bounded by the physical
bytes that must carry it *before* any allocation — name length by the
remaining header bytes, data areas by the remaining archive bytes, the
declared unpacked size by ``max_member_bytes`` checked BEFORE the stored
payload is sliced. Malformed structure (bad magic, CRC mismatch,
truncated vint, header overruns) raises :class:`BadRar`, which the
binarchive caller maps to the corrupt taxonomy; no input can make this
module allocate more than the archive's own size plus one member cap.
"""

from __future__ import annotations

import zlib

MAGIC5 = b"Rar!\x1a\x07\x01\x00"

_T_MAIN = 1
_T_FILE = 2
_T_SERVICE = 3
_T_CRYPT = 4
_T_END = 5

_HFL_EXTRA = 0x01
_HFL_DATA = 0x02

_FFL_DIRECTORY = 0x01
_FFL_UTIME = 0x02
_FFL_CRC32 = 0x04
_FFL_UNKNOWN_SIZE = 0x08


class BadRar(ValueError):
    """Malformed RAR5 input (maps to the corrupt taxonomy)."""


class _Reader:
    __slots__ = ("b", "i", "end")

    def __init__(self, b: bytes, i: int = 0, end: int | None = None):
        self.b = b
        self.i = i
        self.end = len(b) if end is None else end

    def vint(self) -> int:
        """Little-endian base-128 varint, bit 7 continues; bounded to 10
        bytes (a 70-bit value is already structurally implausible)."""
        v = 0
        for shift in range(0, 70, 7):
            if self.i >= self.end:
                raise BadRar("truncated vint")
            x = self.b[self.i]
            self.i += 1
            v |= (x & 0x7F) << shift
            if not x & 0x80:
                return v
        raise BadRar("vint too long")

    def u32(self) -> int:
        if self.i + 4 > self.end:
            raise BadRar("truncated u32")
        v = int.from_bytes(self.b[self.i : self.i + 4], "little")
        self.i += 4
        return v

    def take(self, n: int) -> bytes:
        if n < 0 or self.i + n > self.end:
            raise BadRar("field past end")
        out = self.b[self.i : self.i + n]
        self.i += n
        return out


class Member:
    """One enumerated entry: metadata always; ``payload`` only when the
    member was stored uncompressed, fit the cap, and passed its CRC."""

    __slots__ = ("name", "size", "payload", "status", "method", "head")

    def __init__(self, name, size, payload, status, method, head=b""):
        self.name = name
        self.size = size
        self.payload = payload
        self.status = status  # ok | unsupported | too-large
        self.method = method  # 0=store .. 5=best, -1 encrypted
        self.head = head  # sniffable prefix when payload withheld


def list_members(data: bytes, max_member_bytes: int = 1 << 26) -> list[Member]:
    """Walk every RAR5 block header; return one :class:`Member` per file
    entry. Never allocates beyond the input size + one member cap."""
    if not data.startswith(MAGIC5):
        raise BadRar("bad RAR5 signature")
    r = _Reader(data, len(MAGIC5))
    out: list[Member] = []
    seen_end = False
    while r.i < len(data) and not seen_end:
        crc = r.u32()
        size_field_start = r.i
        hsize = r.vint()
        hstart = r.i
        if hsize <= 0 or hstart + hsize > len(data):
            raise BadRar("header size past end")
        # technote: header CRC covers the size field THROUGH the extra area
        if zlib.crc32(data[size_field_start : hstart + hsize]) != crc:
            raise BadRar("header CRC mismatch")
        h = _Reader(data, hstart, hstart + hsize)
        htype = h.vint()
        hflags = h.vint()
        extra_size = h.vint() if hflags & _HFL_EXTRA else 0
        data_size = h.vint() if hflags & _HFL_DATA else 0
        if extra_size > hsize:
            raise BadRar("extra area larger than header")
        data_start = hstart + hsize
        if data_size > len(data) - data_start:
            raise BadRar("data area past end")
        if htype == _T_CRYPT:
            # whole-archive encryption: nothing after this is readable
            out.append(Member("", 0, None, "unsupported", -1))
            return out
        if htype == _T_FILE:
            m = _parse_file(h, hflags, extra_size, data, data_start,
                            data_size, max_member_bytes)
            if m is not None:
                out.append(m)
        elif htype == _T_SERVICE:
            # service records (recovery, quick-open, comments) are never
            # emitted as members, and real WinRAR writes some whose
            # stored-size/CRC rules differ from file entries — parse them
            # leniently: a content-rule violation skips the record instead
            # of condemning the archive (header CRC already vouched for
            # the bytes; round-5 ADVICE item)
            try:
                _parse_file(h, hflags, extra_size, data, data_start,
                            data_size, max_member_bytes)
            except BadRar:
                pass
        elif htype == _T_END:
            seen_end = True
        # _T_MAIN and unknown-but-CRC-valid types: metadata only, skip
        r.i = data_start + data_size
    if not seen_end:
        raise BadRar("missing end-of-archive header")
    return out


def _parse_file(h: _Reader, hflags: int, extra_size: int, data: bytes,
                data_start: int, data_size: int, max_member_bytes: int):
    ffl = h.vint()
    unp_size = h.vint()
    h.vint()  # attributes
    if ffl & _FFL_UTIME:
        h.u32()
    dcrc = h.u32() if ffl & _FFL_CRC32 else None
    comp = h.vint()
    method = (comp >> 7) & 0x07
    h.vint()  # host OS
    nlen = h.vint()
    # the name field lives BEFORE the extra area: bound it by the header
    # minus extra_size so a CRC-valid crafted header can't make the name
    # overlap the extra-area bytes _has_encryption_record re-parses
    # (round-5 ADVICE item)
    if nlen > h.end - extra_size - h.i:
        raise BadRar("name length past header")
    try:
        name = h.take(nlen).decode("utf-8")
    except UnicodeDecodeError as e:
        raise BadRar("bad name encoding") from e
    if ffl & _FFL_DIRECTORY:
        return None  # directories are structure, not members (zip/tar parity)
    if ffl & _FFL_UNKNOWN_SIZE:
        unp_size = data_size
    encrypted = _has_encryption_record(h.b, h.end - extra_size, h.end)
    if encrypted:
        return Member(name, unp_size, None, "unsupported", -1)
    if hflags & 0x18:
        # member split across volumes: not reconstructible from one blob
        return Member(name, unp_size, None, "unsupported", method)
    if method != 0:
        # compressed with the proprietary RAR algorithm (no public spec):
        # metadata row only — the documented end state, not a gap
        return Member(name, unp_size, None, "unsupported", method)
    payload = data[data_start : data_start + data_size]
    if unp_size != data_size:
        raise BadRar("stored member size mismatch")
    if unp_size > max_member_bytes:
        return Member(name, unp_size, None, "too-large", 0,
                      head=payload[:265])
    if dcrc is not None and zlib.crc32(payload) != dcrc:
        raise BadRar("stored member CRC mismatch")
    return Member(name, unp_size, payload, "ok", 0)


def _has_encryption_record(b: bytes, extra_start: int, extra_end: int) -> bool:
    """Walk the extra-area records (size vint + type vint + data); record
    type 0x01 on a file header is file encryption. Malformed records are
    treated as no-record — the header CRC already vouched for the bytes."""
    r = _Reader(b, max(extra_start, 0), extra_end)
    try:
        while r.i < r.end:
            rsize = r.vint()
            rstart = r.i
            if rsize <= 0 or rstart + rsize > r.end:
                return False
            rr = _Reader(b, rstart, rstart + rsize)
            if rr.vint() == 0x01:
                return True
            r.i = rstart + rsize
    except BadRar:
        return False
    return False


# ------------------------------------------------------------------ writer


def _vint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def make_rar5(members: list[tuple[str, bytes]]) -> bytes:
    """Fixture writer: a stored (method 0) RAR5 archive per the public
    technote layout — the parser's round-trip partner in tests."""
    out = bytearray(MAGIC5)

    def emit(htype: int, hflags: int, body: bytes, payload: bytes = b""):
        hdr = _vint(htype) + _vint(hflags)
        if hflags & _HFL_DATA:
            hdr += _vint(len(payload))
        hdr += body
        sized = _vint(len(hdr)) + hdr  # CRC covers the size field too
        out.extend(zlib.crc32(sized).to_bytes(4, "little"))
        out.extend(sized)
        out.extend(payload)

    emit(_T_MAIN, 0, _vint(0))  # archive flags: plain single volume
    for name, payload in members:
        nb = name.encode("utf-8")
        body = (
            _vint(_FFL_CRC32)          # file flags: data CRC present
            + _vint(len(payload))      # unpacked size
            + _vint(0x20)              # attributes
            + zlib.crc32(payload).to_bytes(4, "little")
            + _vint(0)                 # compression info: store, v5.0
            + _vint(1)                 # host OS: unix
            + _vint(len(nb))
            + nb
        )
        emit(_T_FILE, _HFL_DATA, body, payload)
    emit(_T_END, 0, _vint(0))  # end-of-archive, not a volume chain
    return bytes(out)
