"""Snappy raw + framed (.sz) codec, from scratch (SURVEY.md §2.9 X10
family — single-file compressed wrappers, the ``COMPRESSED_FORMAT_EXTS``
shape of ``Step3Unpacker.java:64-71``; snappy is the default codec of
the parquet/avro world this engine lives in, so reading a ``.sz``-wrapped
payload belongs in the same wrapper taxonomy as gz/.Z/lz4).

Written against the PUBLIC format descriptions in the google/snappy
repository (``format_description.txt`` for the raw block format,
``framing_format.txt`` for the stream format):

Raw block — a varint uncompressed length, then tagged elements: tag low
2 bits 00=literal (len-1 in the high 6 bits, 60..63 meaning that many
little-endian length bytes follow), 01=copy with 3-bit len-4 / 11-bit
offset, 10=copy with 6-bit len-1 / 16-bit offset, 11=copy with 32-bit
offset. Copies may overlap (byte-at-a-time semantics, like LZ4).

Framed stream — chunks of ``type(1) || length(3, LE) || payload``:
``0xff`` stream identifier ("sNaPpY"), ``0x00`` compressed data and
``0x01`` uncompressed data (both carrying a *masked CRC32C* of the
uncompressed bytes), ``0xfe`` padding, ``0x80-0xfd`` skippable. At most
65536 uncompressed bytes per chunk. The CRC mask is
``((crc >> 15) | (crc << 17)) + 0xa282ead8``.

CRC32C (Castagnoli) is implemented table-driven from its public
polynomial 0x1EDC6F41 (reflected 0x82F63B78).

Validation: the test suite round-trips this codec against the JVM
``snappy-java`` library bundled with Spark (raw ``Snappy.compress`` /
``Snappy.uncompress`` both directions, plus the framed streams when the
bundled version exposes them) — the same external bar as ``lz4f.py``
(lz4-java) and ``lzc.py`` (system uncompress).

Bomb posture: :func:`decompress` takes an output limit and returns
``(payload, overflowed)`` — the shared wrapper contract. Each chunk's
declared uncompressed length is checked against both the 65536 spec
ceiling and the remaining budget BEFORE its block is decoded; malformed
input raises :class:`BadSnappy`.
"""

from __future__ import annotations

import struct

MAGIC = b"\xff\x06\x00\x00sNaPpY"

_MAX_CHUNK = 65536
_CRC_MASK_DELTA = 0xA282EAD8
_M32 = 0xFFFFFFFF


class BadSnappy(ValueError):
    """Malformed snappy input (maps to the corrupt taxonomy)."""


def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_crc32c_table()


def _make_crc32c_slices() -> list[list[int]]:
    # slicing-by-8 tables: T[j][n] advances byte n through j+1 zero bytes
    tables = [_CRC_TABLE]
    for _ in range(7):
        prev = tables[-1]
        tables.append(
            [_CRC_TABLE[c & 0xFF] ^ (c >> 8) for c in prev]
        )
    return tables


_CRC_SLICES = _make_crc32c_slices()


def crc32c(data: bytes) -> int:
    # slicing-by-8 (identical CRC to the byte-at-a-time loop, ~3x fewer
    # Python iterations — this runs over every chunk on both the compress
    # and the verify side)
    crc = _M32
    t0, t1, t2, t3, t4, t5, t6, t7 = _CRC_SLICES
    n8 = len(data) & ~7
    for i in range(0, n8, 8):
        q = int.from_bytes(data[i : i + 8], "little")
        lo = (crc ^ q) & _M32
        hi = q >> 32
        crc = (
            t7[lo & 0xFF]
            ^ t6[(lo >> 8) & 0xFF]
            ^ t5[(lo >> 16) & 0xFF]
            ^ t4[lo >> 24]
            ^ t3[hi & 0xFF]
            ^ t2[(hi >> 8) & 0xFF]
            ^ t1[(hi >> 16) & 0xFF]
            ^ t0[hi >> 24]
        )
    for b in data[n8:]:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ _M32


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _CRC_MASK_DELTA) & _M32


# ------------------------------------------------------------------ raw


def _uvarint(b: bytes, i: int) -> tuple[int, int]:
    v = 0
    for shift in range(0, 35, 7):
        if i >= len(b):
            raise BadSnappy("truncated varint")
        x = b[i]
        i += 1
        v |= (x & 0x7F) << shift
        if not x & 0x80:
            return v, i
    raise BadSnappy("varint too long")


def uncompress_raw(src: bytes, limit: int | None = None) -> bytes:
    """Decode one raw snappy block. The declared length is validated
    against ``limit`` BEFORE decoding (bomb posture) and against the
    actual output after."""
    declared, i = _uvarint(src, 0)
    if limit is not None and declared > limit:
        raise BadSnappy("declared size beyond limit")
    out = bytearray()
    n = len(src)
    while i < n:
        tag = src[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if i + extra > n:
                    raise BadSnappy("truncated literal length")
                ln = int.from_bytes(src[i : i + extra], "little")
                i += extra
            ln += 1
            if i + ln > n:
                raise BadSnappy("literal past end")
            out += src[i : i + ln]
            i += ln
        else:
            if kind == 1:
                if i >= n:
                    raise BadSnappy("truncated copy1")
                ln = ((tag >> 2) & 0x07) + 4
                off = ((tag >> 5) << 8) | src[i]
                i += 1
            elif kind == 2:
                if i + 2 > n:
                    raise BadSnappy("truncated copy2")
                ln = (tag >> 2) + 1
                off = src[i] | (src[i + 1] << 8)
                i += 2
            else:
                if i + 4 > n:
                    raise BadSnappy("truncated copy4")
                ln = (tag >> 2) + 1
                (off,) = struct.unpack_from("<I", src, i)
                i += 4
            if off == 0 or off > len(out):
                raise BadSnappy("invalid copy offset")
            if len(out) + ln > declared:
                raise BadSnappy("copy past declared size")
            pos = len(out) - off
            if off >= ln:
                out += out[pos : pos + ln]
            else:  # overlapping copy: repeat semantics
                chunk = out[pos:]
                reps = ln // off + 1
                out += (chunk * reps)[:ln]
        if len(out) > declared:
            raise BadSnappy("output past declared size")
    if len(out) != declared:
        raise BadSnappy("declared size mismatch")
    return bytes(out)


def compress_raw(src: bytes) -> bytes:
    """Greedy hash-table raw snappy encoder; any conforming decoder
    (snappy-java's included) must reproduce ``src`` exactly."""
    n = len(src)
    out = bytearray()
    v = n
    while True:  # uncompressed-length varint
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            break
    # all 4-byte little-endian keys in one vectorized pass (same rewrite as
    # lz4f.compress_block): ``keys[cand] == k`` ⟺ the two 4-byte windows
    # are equal, so emitted elements are identical to the sliced scan
    if n >= 4:
        import numpy as np

        bb = np.frombuffer(src, dtype=np.uint8).astype(np.uint32)
        keys = (
            bb[:-3] | (bb[1:-2] << 8) | (bb[2:-1] << 16) | (bb[3:] << 24)
        ).tolist()
    else:
        keys = []
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    misses = 0
    while i + 4 <= n:
        k = keys[i]
        cand = table.get(k)
        table[k] = i
        if cand is None or i - cand > 0xFFFF:
            # skip acceleration (the reference encoder's bail-out): step
            # grows with consecutive misses; skipped positions are emitted
            # as literals, so the stream stays spec-valid
            i += 1 + (misses >> 5)
            misses += 1
            continue
        misses = 0
        mlen = 4
        while (
            i + mlen + 8 <= n
            and src[cand + mlen : cand + mlen + 8] == src[i + mlen : i + mlen + 8]
        ):
            mlen += 8
        while i + mlen < n and src[cand + mlen] == src[i + mlen]:
            mlen += 1
        _emit_literal(out, src, anchor, i)
        _emit_copy(out, i - cand, mlen)
        i += mlen
        anchor = i
    _emit_literal(out, src, anchor, n)
    return bytes(out)


def _emit_literal(out: bytearray, src: bytes, start: int, end: int) -> None:
    ln = end - start
    if ln == 0:
        return
    lm = ln - 1
    if lm < 60:
        out.append(lm << 2)
    else:
        nbytes = (lm.bit_length() + 7) // 8
        out.append((59 + nbytes) << 2)
        out += lm.to_bytes(nbytes, "little")
    out += src[start:end]


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    # long matches split into <=64-byte copy2/copy1 elements; keep every
    # tail >=4 bytes so copy1 stays eligible (copy2 legally allows 1..64,
    # but emitting only >=4 matches what reference encoders produce)
    while ln > 0:
        step = min(ln, 64)
        if ln - step in (1, 2, 3):
            step = ln - 4
        if 4 <= step <= 11 and off < 2048:
            out.append(0x01 | ((step - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        else:
            out.append(0x02 | ((step - 1) << 2))
            out += off.to_bytes(2, "little")
        ln -= step


# ---------------------------------------------------------------- framed


def compress(data: bytes) -> bytes:
    """Encode ``data`` as one framed snappy (.sz) stream."""
    out = bytearray(MAGIC)
    for pos in range(0, len(data), _MAX_CHUNK) or [0]:
        raw = data[pos : pos + _MAX_CHUNK]
        comp = compress_raw(raw)
        crc = struct.pack("<I", _masked_crc(raw))
        if len(comp) < len(raw):
            body = crc + comp
            out.append(0x00)
        else:
            body = crc + raw
            out.append(0x01)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def decompress(data: bytes, limit: int) -> tuple[bytes, bool]:
    """Decode a framed snappy stream with at most ``limit`` output bytes;
    returns ``(payload, overflowed)`` — the shared wrapper contract.
    Verifies every chunk's masked CRC32C; raises :class:`BadSnappy` on
    malformed input."""
    if not data.startswith(MAGIC):
        raise BadSnappy("bad stream identifier")
    i = len(MAGIC)
    n = len(data)
    out = bytearray()
    while i < n:
        if i + 4 > n:
            raise BadSnappy("truncated chunk header")
        ctype = data[i]
        clen = int.from_bytes(data[i + 1 : i + 4], "little")
        i += 4
        if i + clen > n:
            raise BadSnappy("chunk past end")
        body = data[i : i + clen]
        i += clen
        if ctype in (0x00, 0x01):
            if clen < 4:
                raise BadSnappy("chunk too short for CRC")
            (crc,) = struct.unpack_from("<I", body, 0)
            payload = body[4:]
            if ctype == 0x00:
                raw = uncompress_raw(payload, limit=_MAX_CHUNK)
            else:
                raw = payload
            if len(raw) > _MAX_CHUNK:
                raise BadSnappy("chunk exceeds 64KiB spec ceiling")
            if _masked_crc(raw) != crc:
                raise BadSnappy("chunk CRC mismatch")
            budget = limit - len(out)
            if len(raw) > budget:
                out += raw[:budget]
                return bytes(out), True
            out += raw
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue  # padding / skippable
        elif ctype == 0xFF:
            if body != MAGIC[4:]:
                raise BadSnappy("bad repeated stream identifier")
        else:
            raise BadSnappy(f"reserved unskippable chunk 0x{ctype:02x}")
    return bytes(out), False
