"""Minimal from-scratch 7z container codec (SURVEY.md §2.9 X10 stretch).

The reference unpacks 7z via Tika's PackageParser
(``bugtracker-crawler/.../Step3Unpacker.java:56-62``, ``PACKAGE_FORMAT_EXTS``
includes ``.7z``); Python's stdlib has no 7z module, so rounds 1-3 left the
format detect-only. This module implements the subset of the PUBLIC 7z
byte layout (``7zFormat.txt`` in the 7-Zip source distribution) needed to
actually read the common case, with stdlib ``lzma`` doing the entropy
coding:

- signature + start header (next-header offset/size);
- the header property tree: ``kHeader`` raw or ``kEncodedHeader``
  (LZMA-compressed header — the 7z CLI default), ``kPackInfo`` /
  ``kUnpackInfo`` / ``kSubStreamsInfo`` / ``kFilesInfo`` with UTF-16LE
  names, empty-stream/empty-file bit vectors, and the 7z variable-length
  number encoding;
- folders with ONE coder: Copy (0x00), LZMA1 (0x030101, raw stream +
  5-byte props) and LZMA2 (0x21, raw stream + 1-byte dict prop) — decoded
  with ``lzma.LZMADecompressor(format=FORMAT_RAW)``. Multi-coder chains
  (BCJ filters, AES) raise :class:`UnsupportedCoder`, which the caller
  maps to the ``unsupported`` taxonomy rather than ``corrupt``.

The writer (:func:`make_7z`) emits a deterministic Copy-coder archive with
a raw (uncompressed) header — genuine 7z bytes that external tools can
list — used by fixtures and the oracled round-trip query the same way
``binarchive.make_zip`` is.

Byte caps mirror ``binarchive``: declared unpack sizes are checked BEFORE
decompression, and LZMA output is produced through a bounded decompressor,
so a 7z bomb degrades to a ``too-large`` status row upstream instead of an
executor OOM.
"""

from __future__ import annotations

import lzma
import struct
import zlib

SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZES = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_COPY = b"\x00"
_LZMA1 = b"\x03\x01\x01"
_LZMA2 = b"\x21"


class Bad7z(ValueError):
    """Malformed 7z container (maps to the corrupt taxonomy)."""


class UnsupportedCoder(ValueError):
    """Valid 7z, but a coder chain this reader does not implement
    (BCJ/AES/multi-coder folders) — maps to the unsupported taxonomy."""


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def byte(self) -> int:
        if self.i >= len(self.b):
            raise Bad7z("truncated header")
        v = self.b[self.i]
        self.i += 1
        return v

    def bytes(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise Bad7z("truncated header")
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def num(self) -> int:
        """7z variable-length number: high bits of the first byte say how
        many little-endian extra bytes follow."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if (first & mask) == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def u32(self) -> int:
        return int.from_bytes(self.bytes(4), "little")

    def u64(self) -> int:
        return int.from_bytes(self.bytes(8), "little")


def _write_num(value: int) -> bytes:
    """Inverse of ``_Reader.num``: with i extra bytes the capacity is
    7·(i+1) bits (8i from the extras + 7−i from the first byte)."""
    for i in range(8):
        if value < (1 << (7 * (i + 1))):
            if i == 0:
                return bytes([value])
            extras = (value & ((1 << (8 * i)) - 1)).to_bytes(i, "little")
            first = ((0xFF << (8 - i)) & 0xFF) | (value >> (8 * i))
            return bytes([first]) + extras
    return b"\xff" + value.to_bytes(8, "little")


def _bounded_count(r: _Reader, n: int, what: str) -> int:
    """Counts read from the header are attacker-controlled; every entry they
    describe needs at least one header byte, so any count beyond the header
    length is malformed — reject BEFORE allocating proportional memory."""
    if n > len(r.b):
        raise Bad7z(f"implausible {what} count {n}")
    return n


def _read_bitvector(r: _Reader, n: int) -> list[bool]:
    out = []
    mask, byte = 0, 0
    for _ in range(n):
        if mask == 0:
            byte = r.byte()
            mask = 0x80
        out.append(bool(byte & mask))
        mask >>= 1
    return out


def _bounded_lzma(dec, data: bytes, limit: int) -> bytes:
    out = dec.decompress(data, limit + 1)
    if len(out) > limit:
        raise Bad7z("decoded size exceeds declared size")
    while not dec.eof and not dec.needs_input:
        chunk = dec.decompress(b"", limit + 1 - len(out))
        if not chunk:
            break
        out += chunk
        if len(out) > limit:
            raise Bad7z("decoded size exceeds declared size")
    return out


class _Folder:
    __slots__ = ("coder_id", "props", "unpack_size", "num_unpack_streams",
                 "substream_sizes")

    def __init__(self):
        self.coder_id = b""
        self.props = b""
        self.unpack_size = 0
        self.num_unpack_streams = 1
        self.substream_sizes: list[int] | None = None


def _parse_folder(r: _Reader) -> _Folder:
    f = _Folder()
    num_coders = r.num()
    if num_coders != 1:
        raise UnsupportedCoder(f"{num_coders}-coder folder")
    flags = r.byte()
    id_size = flags & 0x0F
    f.coder_id = r.bytes(id_size)
    if flags & 0x10:  # complex coder: multiple in/out streams
        raise UnsupportedCoder("complex coder")
    if flags & 0x20:
        prop_size = r.num()
        f.props = r.bytes(prop_size)
    if f.coder_id not in (_COPY, _LZMA1, _LZMA2):
        raise UnsupportedCoder(f.coder_id.hex())
    return f


def _parse_streams_info(r: _Reader):
    """Returns (pack_pos, pack_sizes, folders). Property order per spec."""
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[_Folder] = []
    while True:
        t = r.num()
        if t == _K_END:
            return pack_pos, pack_sizes, folders
        if t == _K_PACK_INFO:
            pack_pos = r.num()
            n = _bounded_count(r, r.num(), "pack stream")
            while True:
                t2 = r.num()
                if t2 == _K_END:
                    break
                if t2 == _K_SIZE:
                    pack_sizes = [r.num() for _ in range(n)]
                elif t2 == _K_CRC:
                    all_defined = r.byte()
                    defined = [True] * n if all_defined else _read_bitvector(r, n)
                    for d in defined:
                        if d:
                            r.u32()
                else:
                    raise Bad7z(f"unexpected pack prop {t2:#x}")
        elif t == _K_UNPACK_INFO:
            while True:
                t2 = r.num()
                if t2 == _K_END:
                    break
                if t2 == _K_FOLDER:
                    nf = _bounded_count(r, r.num(), "folder")
                    if r.byte() != 0:
                        raise Bad7z("external folder data")
                    folders = [_parse_folder(r) for _ in range(nf)]
                elif t2 == _K_UNPACK_SIZES:
                    for f in folders:
                        f.unpack_size = r.num()  # 1 coder ⇒ 1 out stream
                elif t2 == _K_CRC:
                    nf = len(folders)
                    all_defined = r.byte()
                    defined = [True] * nf if all_defined else _read_bitvector(r, nf)
                    for d in defined:
                        if d:
                            r.u32()
                else:
                    raise Bad7z(f"unexpected unpack prop {t2:#x}")
        elif t == _K_SUBSTREAMS:
            counts = [1] * len(folders)
            while True:
                t2 = r.num()
                if t2 == _K_END:
                    break
                if t2 == _K_NUM_UNPACK_STREAM:
                    counts = [
                        _bounded_count(r, r.num(), "unpack stream")
                        for _ in folders
                    ]
                elif t2 == _K_SIZE:
                    # sizes for all but the last substream of each folder
                    for f, c in zip(folders, counts):
                        sizes = [r.num() for _ in range(c - 1)]
                        sizes.append(f.unpack_size - sum(sizes))
                        if sizes[-1] < 0:
                            raise Bad7z("substream sizes exceed folder size")
                        f.substream_sizes = sizes
                elif t2 == _K_CRC:
                    total = _bounded_count(
                        r,
                        sum(c for f, c in zip(folders, counts)),
                        "substream CRC",
                    )
                    all_defined = r.byte()
                    defined = (
                        [True] * total if all_defined else _read_bitvector(r, total)
                    )
                    for d in defined:
                        if d:
                            r.u32()
                else:
                    raise Bad7z(f"unexpected substream prop {t2:#x}")
            for f, c in zip(folders, counts):
                f.num_unpack_streams = c
                if f.substream_sizes is None:
                    f.substream_sizes = [f.unpack_size] if c == 1 else None
                if f.substream_sizes is None:
                    raise Bad7z("missing substream sizes")
        else:
            raise Bad7z(f"unexpected streams prop {t:#x}")


def _decode_folder(f: _Folder, packed: bytes, max_out: int) -> bytes:
    if f.unpack_size > max_out:
        raise Bad7z("declared unpack size over cap")  # caller pre-checks
    if f.coder_id == _COPY:
        if len(packed) < f.unpack_size:
            raise Bad7z("short copy stream")
        return packed[: f.unpack_size]
    if f.coder_id == _LZMA1:
        if len(f.props) != 5:
            raise Bad7z("bad lzma1 props")
        d = f.props[0]
        lc, rem = d % 9, d // 9
        lp, pb = rem % 5, rem // 5
        if pb > 4:
            raise Bad7z("bad lzma1 props byte")
        dict_size = int.from_bytes(f.props[1:5], "little")
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb,
                      "dict_size": max(dict_size, 4096)}],
        )
        out = _bounded_lzma(dec, packed, f.unpack_size)
    else:  # LZMA2
        if len(f.props) != 1:
            raise Bad7z("bad lzma2 props")
        p = f.props[0]
        dict_size = (2 | (p & 1)) << (p // 2 + 11) if p < 40 else 0xFFFFFFFF
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": max(dict_size, 4096)}],
        )
        out = _bounded_lzma(dec, packed, f.unpack_size)
    if len(out) < f.unpack_size:
        raise Bad7z("short lzma stream")
    return out[: f.unpack_size]


def _parse_files_info(r: _Reader):
    """Returns (names, empty_stream_flags, empty_file_flags).

    ``empty_file_flags`` is per-entry (expanded from the spec's
    empty-stream-subset bit vector): an entry with an empty stream that is
    NOT marked kEmptyFile is a directory, per ``7zFormat.txt``.
    """
    n = _bounded_count(r, r.num(), "file")
    names: list[str] = []
    empty_stream = [False] * n
    empty_file_subset: list[bool] | None = None
    while True:
        t = r.num()
        if t == _K_END:
            break
        size = r.num()
        end = r.i + size
        if t == _K_EMPTY_STREAM:
            empty_stream = _read_bitvector(r, n)
        elif t == _K_EMPTY_FILE:
            empty_file_subset = _read_bitvector(r, sum(empty_stream))
        elif t == _K_NAME:
            if r.byte() != 0:
                raise Bad7z("external names")
            raw = r.bytes(end - r.i)
            try:
                parts = raw.decode("utf-16-le").split("\x00")
            except UnicodeDecodeError as e:
                raise Bad7z("bad name encoding") from e
            names = parts[:-1] if parts and parts[-1] == "" else parts
        # every other property (times, attrs, ...) is skipped
        r.i = end
    if names and len(names) != n:
        raise Bad7z("name count mismatch")
    if not names:
        names = [f"file{i}" for i in range(n)]
    # expand the empty-file subset vector to per-entry flags
    empty_file = [False] * n
    it = iter(empty_file_subset or [])
    for i, es in enumerate(empty_stream):
        if es:
            empty_file[i] = next(it, False)
    return names, empty_stream, empty_file


def list_members(
    data: bytes, max_member_bytes: int
) -> "list[tuple[str, bytes | None, int, bytes]]":
    """Flatten a 7z archive: ``(name, payload_or_None, size, sniff_head)``
    per file — payload is None when the declared size exceeds the cap (the
    head carries the first bytes for content re-detection, decoded without
    materializing the rest). Raises :class:`Bad7z` on malformed input and
    :class:`UnsupportedCoder` on coder chains outside the supported set."""
    if not data.startswith(SIGNATURE) or len(data) < 32:
        raise Bad7z("bad signature")
    nh_offset = int.from_bytes(data[12:20], "little")
    nh_size = int.from_bytes(data[20:28], "little")
    base = 32
    start = base + nh_offset
    if nh_size == 0 or start + nh_size > len(data):
        raise Bad7z("bad next-header bounds")
    header = data[start : start + nh_size]
    r = _Reader(header)
    t = r.num()
    if t == _K_ENCODED_HEADER:
        pack_pos, pack_sizes, folders = _parse_streams_info(r)
        if len(folders) != 1 or len(pack_sizes) != 1:
            raise Bad7z("bad encoded header shape")
        off = base + pack_pos
        packed = data[off : off + pack_sizes[0]]
        # headers are small; 64 MiB is far beyond any sane header
        header = _decode_folder(folders[0], packed, 64 * 1024 * 1024)
        r = _Reader(header)
        t = r.num()
    if t != _K_HEADER:
        raise Bad7z(f"unexpected root prop {t:#x}")

    pack_pos, pack_sizes, folders = 0, [], []
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    have_files = False
    while True:
        t = r.num()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders = _parse_streams_info(r)
        elif t == _K_FILES_INFO:
            names, empty_stream, empty_file = _parse_files_info(r)
            have_files = True
        else:
            raise Bad7z(f"unexpected header prop {t:#x}")
    if not have_files:
        n_streams = _bounded_count(
            r, sum(f.num_unpack_streams for f in folders), "stream"
        )
        names = [f"file{i}" for i in range(n_streams)]
        empty_stream = [False] * len(names)
        empty_file = [False] * len(names)
    if len(pack_sizes) != len(folders):
        # one pack stream per single-coder folder in the supported subset
        raise UnsupportedCoder("pack/folder stream mismatch")

    # decode folders lazily with the cap applied BEFORE decompression
    payloads: list[tuple[bytes | None, int, bytes]] = []
    off = 32 + pack_pos
    for f, psize in zip(folders, pack_sizes):
        packed = data[off : off + psize]
        if len(packed) < psize:
            raise Bad7z("truncated pack stream")
        off += psize
        sizes = f.substream_sizes or [f.unpack_size]
        if f.unpack_size > max_member_bytes:
            # decode only a sniff head; never materialize the whole folder
            head = b""
            try:
                if f.coder_id == _COPY:
                    head = packed[:265]
                else:
                    short = _Folder()
                    short.coder_id, short.props = f.coder_id, f.props
                    short.unpack_size = min(265, f.unpack_size)
                    head = _decode_folder(short, packed, short.unpack_size)
            except Exception:
                head = b""
            pos = 0
            for s in sizes:
                payloads.append((None, s, head[pos : pos + 265]))
                pos += s
            continue
        out = _decode_folder(f, packed, max_member_bytes)
        pos = 0
        for s in sizes:
            if s > max_member_bytes:
                payloads.append((None, s, out[pos : pos + 265]))
            else:
                payloads.append((out[pos : pos + s], s, out[pos : pos + 265]))
            pos += s

    result = []
    it = iter(payloads)
    for name, empty, is_file in zip(names, empty_stream, empty_file):
        if empty:
            # empty stream + kEmptyFile bit = zero-byte file; without the
            # bit it is a directory — skipped, matching the zip/tar paths
            # (is_dir()/isfile() filtering) and the reference's
            # PackageParser behavior (Step3Unpacker.java:56-62).
            if is_file:
                result.append((name, b"", 0, b""))
        else:
            try:
                payload, size, head = next(it)
            except StopIteration as e:
                raise Bad7z("fewer streams than files") from e
            result.append((name, payload, size, head))
    return result


# ---------------------------------------------------------------------------
# writer — deterministic Copy-coder archive with a raw header
# ---------------------------------------------------------------------------
def make_7z(members: "list[tuple[str, bytes]]") -> bytes:
    """Genuine 7z bytes: one Copy-coder folder per non-empty member, raw
    (uncompressed) header, real CRCs — deterministic for fixture use."""
    non_empty = [(n, d) for n, d in members if d]
    body = b"".join(d for _, d in non_empty)

    h = bytearray()
    h += _write_num(_K_HEADER)
    if non_empty:
        h += _write_num(_K_MAIN_STREAMS)
        h += _write_num(_K_PACK_INFO)
        h += _write_num(0)                      # pack pos
        h += _write_num(len(non_empty))         # num pack streams
        h += _write_num(_K_SIZE)
        for _, d in non_empty:
            h += _write_num(len(d))
        h += _write_num(_K_END)
        h += _write_num(_K_UNPACK_INFO)
        h += _write_num(_K_FOLDER)
        h += _write_num(len(non_empty))
        h.append(0)                             # not external
        for _ in non_empty:
            h += _write_num(1)                  # one coder
            h.append(0x01)                      # id size 1, simple, no props
            h += _COPY
        h += _write_num(_K_UNPACK_SIZES)
        for _, d in non_empty:
            h += _write_num(len(d))
        h += _write_num(_K_END)
        h += _write_num(_K_END)
    h += _write_num(_K_FILES_INFO)
    h += _write_num(len(members))
    empties = [not d for _, d in members]
    if any(empties):
        vec = bytearray((len(members) + 7) // 8)
        for i, e in enumerate(empties):
            if e:
                vec[i // 8] |= 0x80 >> (i % 8)
        h += _write_num(_K_EMPTY_STREAM)
        h += _write_num(len(vec))
        h += bytes(vec)
        # mark every empty stream as an empty FILE (all-ones kEmptyFile
        # vector over the empty subset) — without it they read back as
        # directories per 7zFormat.txt
        n_empty = sum(empties)
        fvec = bytes(
            0xFF if i < n_empty // 8 else (0xFF << (8 - n_empty % 8)) & 0xFF
            for i in range((n_empty + 7) // 8)
        )
        h += _write_num(_K_EMPTY_FILE)
        h += _write_num(len(fvec))
        h += fvec
    names_blob = b"\x00" + "".join(n + "\x00" for n, _ in members).encode("utf-16-le")
    h += _write_num(_K_NAME)
    h += _write_num(len(names_blob))
    h += names_blob
    h += _write_num(_K_END)
    h += _write_num(_K_END)

    header = bytes(h)
    nh_offset = len(body)
    start_header = (
        struct.pack("<Q", nh_offset)
        + struct.pack("<Q", len(header))
        + struct.pack("<I", zlib.crc32(header))
    )
    return (
        SIGNATURE
        + b"\x00\x04"  # version 0.4
        + struct.pack("<I", zlib.crc32(start_header))
        + start_header
        + body
        + header
    )
