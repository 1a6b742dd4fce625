"""LZ4 frame + block codec, from scratch (SURVEY.md §2.9 X10 family —
the reference's ``Step3Unpacker.java:64-71`` lists ``lz4`` among its
``COMPRESSED_FORMAT_EXTS`` and unpacks it via commons-compress'
``FramedLZ4CompressorInputStream``; stdlib Python has no LZ4).

Written against the PUBLIC format specifications published in the lz4
repository (``lz4_Frame_format.md`` v1.6.x and ``lz4_Block_format.md``):

Block format — a sequence stream: token byte (high nibble literal count,
low nibble matchlength-4), 255-run extension bytes for either nibble at
15, literals, then a 2-byte little-endian match offset (1..65535; 0 is
invalid) back into the already-decoded output; overlapping matches copy
byte-at-a-time semantics. End-of-block restrictions (encoder side): the
last sequence is literals-only, the final 5 bytes are always literals,
and the last match must start at least 12 bytes before block end.

Frame format — magic ``04 22 4D 18``; FLG (version=01, block-indep,
block-checksum, content-size, content-checksum, dictID bits); BD (block
max size 64KB/256KB/1MB/4MB); optional 8-byte content size; header
checksum byte = ``(xxh32(descriptor) >> 8) & 0xFF``; data blocks as
``uint32le`` length with the high bit flagging an *uncompressed* block;
``0x00000000`` EndMark; optional trailing ``xxh32`` content checksum.
Skippable frames (``5? 2A 4D 18``) are skipped. Linked blocks
(B.Indep=0) are supported on decode by decoding into one contiguous
window.

xxHash32 is implemented from its public specification (the usual five
prime constants) — it is both the frame's checksum primitive and
independently useful.

Validation: the test suite round-trips this codec against the *JVM*
``lz4-java`` library that ships inside pyspark's jars (the same library
Spark itself uses for shuffle/IO compression) in both directions, at
frame and raw-block level — real external compatibility, same bar as
``lzc.py``'s validation against the system ``uncompress`` tool.

Decompression-bomb posture: :func:`decompress` takes an output byte
limit; a declared content size beyond the limit, or cumulative block
output beyond it, returns ``(prefix, True)`` without materializing the
rest — the same ``(payload, overflowed)`` contract as ``lzc.py`` so
``binarchive._list_members`` treats all stream wrappers uniformly. A
compressed block larger than the frame's declared block maximum raises
:class:`BadLz4` (malformed by spec, and the cheap pre-allocation guard).
"""

from __future__ import annotations

import struct

MAGIC = b"\x04\x22\x4d\x18"
_MAGIC_SKIP_LO = 0x184D2A50  # skippable frame magics: 0x184D2A50..5F

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF

#: BD "block max size" table (descriptor bits 6-4 -> bytes)
_BD_SIZES = {4: 64 << 10, 5: 256 << 10, 6: 1 << 20, 7: 4 << 20}


class BadLz4(ValueError):
    """Malformed LZ4 input (maps to the corrupt taxonomy)."""


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 from the public spec; frame checksum primitive."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        for i in range(0, n - 15, 16):
            (a, b, c, d) = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl((v1 + a * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + b * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + c * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + d * _P2) & _M32, 13) * _P1) & _M32
        i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl((h + k * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------- block


def decompress_block(
    src: bytes,
    dst: bytearray,
    limit: int,
    start: int = 0,
    end: int | None = None,
    floor: int = 0,
) -> bool:
    """Decode one raw LZ4 block from ``src[start:end]`` appending onto
    ``dst`` (which may already hold earlier-block history for linked
    frames). ``floor`` is the first ``dst`` position a match may legally
    reach back to (the enclosing frame's start in ``dst`` — matches that
    reach into a PREVIOUS frame's output are spec-invalid and rejected,
    round-5 ADVICE item). Returns True if ``limit`` total output bytes was
    exceeded (output is truncated at the limit); raises :class:`BadLz4` on
    malformed sequences."""
    i = start
    e = len(src) if end is None else end
    while i < e:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= e:
                    raise BadLz4("truncated literal length")
                x = src[i]
                i += 1
                lit += x
                if x != 255:
                    break
        if i + lit > e:
            raise BadLz4("literal run past block end")
        dst += src[i : i + lit]
        i += lit
        if len(dst) > limit:
            del dst[limit:]
            return True
        if i == e:
            return False  # last sequence: literals only, no offset
        if i + 2 > e:
            raise BadLz4("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(dst) - floor:
            raise BadLz4("invalid match offset")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if i >= e:
                    raise BadLz4("truncated match length")
                x = src[i]
                i += 1
                mlen += x
                if x != 255:
                    break
        if len(dst) + mlen > limit:
            mlen = limit + 1 - len(dst)  # decode just past limit, then cut
            overflow = True
        else:
            overflow = False
        pos = len(dst) - offset
        if offset >= mlen:
            dst += dst[pos : pos + mlen]
        else:  # overlapping match: repeat-copy semantics
            chunk = dst[pos:]
            reps = mlen // offset + 1
            dst += (chunk * reps)[:mlen]
        if overflow:
            del dst[limit:]
            return True
    return False


def compress_block(src: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder, honoring the spec's
    end-of-block restrictions. Correctness-first: any conforming decoder
    (incl. lz4-java's) must reproduce ``src`` exactly."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return bytes(out)
    # all 4-byte little-endian keys in one vectorized pass: the per-position
    # ``src[i:i+4]`` slice + int.from_bytes pair was most of encoder time,
    # and ``keys[cand] == k`` is exactly ``src[cand:cand+4] == src[i:i+4]``
    import numpy as np

    if n >= 4:
        b = np.frombuffer(src, dtype=np.uint8).astype(np.uint32)
        keys = (
            b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
        ).tolist()
    else:
        keys = []
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    misses = 0
    # matches may not start within the last 12 bytes; last 5 are literals
    match_limit = n - 5
    while i + 12 <= n:
        k = keys[i]
        cand = table.get(k)
        table[k] = i
        if cand is None or i - cand > 65535 or keys[cand] != k:
            # reference-encoder skip acceleration: after a run of misses,
            # step grows (1 + misses//64), bounding worst-case scan time on
            # incompressible data; any skipped positions simply become
            # literals, so the stream stays spec-valid
            i += 1 + (misses >> 6)
            misses += 1
            continue
        misses = 0
        # extend match forward, capped so the last 5 bytes stay literal
        # (8-byte slice compares first, then byte-wise to the exact end —
        # same mlen as the pure byte-wise scan)
        mlen = 4
        while (
            i + mlen + 8 <= match_limit
            and src[cand + mlen : cand + mlen + 8] == src[i + mlen : i + mlen + 8]
        ):
            mlen += 8
        while i + mlen < match_limit and src[cand + mlen] == src[i + mlen]:
            mlen += 1
        _emit(out, src, anchor, i, i - cand, mlen)
        i += mlen
        anchor = i
    _emit(out, src, anchor, n, 0, 0)  # trailing literals, no match
    return bytes(out)


def _emit(out: bytearray, src: bytes, lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
    lit = lit_end - lit_start
    ml = mlen - 4 if mlen else 0
    token = (min(lit, 15) << 4) | min(ml, 15)
    out.append(token)
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += src[lit_start:lit_end]
    if mlen == 0:
        return
    out.append(offset & 0xFF)
    out.append(offset >> 8)
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


# ---------------------------------------------------------------- frame


def compress(data: bytes, block_max: int = 1 << 20) -> bytes:
    """Encode ``data`` as one LZ4 frame: independent blocks, content size
    declared (lets any decoder — ours included — budget output before
    decompressing), content checksum appended."""
    bd_bits = next(b for b, sz in sorted(_BD_SIZES.items()) if sz >= min(block_max, 4 << 20))
    block_max = _BD_SIZES[bd_bits]
    flg = (1 << 6) | (1 << 5) | (1 << 3) | (1 << 2)  # v01, B.Indep, C.Size, C.Checksum
    desc = bytes([flg, bd_bits << 4]) + struct.pack("<Q", len(data))
    out = bytearray(MAGIC)
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for pos in range(0, len(data), block_max):
        raw = data[pos : pos + block_max]
        comp = compress_block(raw)
        if len(comp) < len(raw):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # incompressible: stored block, high bit set
            out += struct.pack("<I", len(raw) | 0x80000000)
            out += raw
    out += b"\x00\x00\x00\x00"  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress(data: bytes, limit: int) -> tuple[bytes, bool]:
    """Decode LZ4 frame(s) with at most ``limit`` output bytes.

    Returns ``(payload, overflowed)`` — the ``lzc.py`` contract, so
    ``binarchive`` treats every stream wrapper uniformly. Handles
    concatenated and skippable frames, linked blocks, and verifies
    header/block/content checksums when present. Raises :class:`BadLz4`
    on malformed input (caller maps to the corrupt taxonomy)."""
    out = bytearray()
    i = 0
    n = len(data)
    saw_frame = False
    while i < n:
        if i + 4 > n:
            raise BadLz4("truncated magic")
        (magic,) = struct.unpack_from("<I", data, i)
        i += 4
        if (magic & 0xFFFFFFF0) == _MAGIC_SKIP_LO:
            if i + 4 > n:
                raise BadLz4("truncated skippable frame")
            (sk,) = struct.unpack_from("<I", data, i)
            i += 4 + sk
            if i > n:
                raise BadLz4("skippable frame past end")
            continue
        if data[i - 4 : i] != MAGIC:
            raise BadLz4("bad magic")
        saw_frame = True
        i, over = _decompress_one(data, i, out, limit)
        if over:
            return bytes(out), True
    if not saw_frame:
        raise BadLz4("no LZ4 frame")
    return bytes(out), False


def _decompress_one(data: bytes, i: int, out: bytearray, limit: int) -> tuple[int, bool]:
    n = len(data)
    if i + 2 > n:
        raise BadLz4("truncated descriptor")
    flg = data[i]
    bd = data[i + 1]
    if (flg >> 6) != 1:
        raise BadLz4("unsupported frame version")
    if flg & 0x02:
        raise BadLz4("reserved FLG bit set")
    # B.Indep (flg & 0x20) needs no branch here: decoding every block into
    # one contiguous ``out`` gives linked blocks their 64KB history for
    # free, and independent blocks can't legally reach before their start.
    blk_cksum = bool(flg & 0x10)
    has_csize = bool(flg & 0x08)
    cnt_cksum = bool(flg & 0x04)
    has_dict = bool(flg & 0x01)
    if has_dict:
        # a dictionary frame cannot be decoded without its dictionary:
        # attempting it either trips the offset check (corrupt-looking) or
        # silently yields wrong bytes when no content checksum is present —
        # surface it as the 'unsupported' taxonomy instead, like a 7z
        # BCJ/AES coder chain or RAR compression (round-5 ADVICE item)
        from . import sevenz

        raise sevenz.UnsupportedCoder("lz4-dictionary")
    bd_bits = (bd >> 4) & 0x07
    if bd_bits not in _BD_SIZES or (bd & 0x8F):
        raise BadLz4("bad BD byte")
    block_max = _BD_SIZES[bd_bits]
    desc_end = i + 2 + (8 if has_csize else 0) + (4 if has_dict else 0)
    if desc_end + 1 > n:
        raise BadLz4("truncated descriptor")
    declared = None
    if has_csize:
        (declared,) = struct.unpack_from("<Q", data, i + 2)
    if data[desc_end] != (xxh32(data[i:desc_end]) >> 8) & 0xFF:
        raise BadLz4("header checksum mismatch")
    i = desc_end + 1
    frame_start = len(out)
    budget_hit = declared is not None and frame_start + declared > limit
    over = False
    while True:
        if i + 4 > n:
            raise BadLz4("truncated block size")
        (bsz,) = struct.unpack_from("<I", data, i)
        i += 4
        if bsz == 0:
            break  # EndMark
        stored = bool(bsz & 0x80000000)
        bsz &= 0x7FFFFFFF
        if bsz > block_max:
            raise BadLz4("block size exceeds frame block maximum")
        if i + bsz > n:
            raise BadLz4("truncated block")
        if blk_cksum:
            if i + bsz + 4 > n:
                raise BadLz4("truncated block checksum")
            (bck,) = struct.unpack_from("<I", data, i + bsz)
            if bck != xxh32(data[i : i + bsz]):
                raise BadLz4("block checksum mismatch")
        if over:
            pass  # already past limit: skip remaining block payloads
        elif stored:
            take = min(bsz, limit + 1 - len(out))
            out += data[i : i + take]
            if len(out) > limit:
                del out[limit:]
                over = True
        else:
            # linked frames need history in dst; independent blocks get it
            # too (harmless: offsets can't legally reach past block start).
            # floor=frame_start: matches may never reach into a PREVIOUS
            # concatenated frame's output.
            over = decompress_block(
                data, out, limit, i, i + bsz, floor=frame_start
            )
        i += bsz + (4 if blk_cksum else 0)
        if over and budget_hit:
            # declared size already proved overflow; no need to finish
            return i, True
    if cnt_cksum:
        if i + 4 > n:
            raise BadLz4("truncated content checksum")
        (cck,) = struct.unpack_from("<I", data, i)
        i += 4
        if not over and cck != xxh32(bytes(out[frame_start:])):
            raise BadLz4("content checksum mismatch")
    if declared is not None and not over and len(out) - frame_start != declared:
        raise BadLz4("content size mismatch")
    return i, over
