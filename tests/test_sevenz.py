"""From-scratch 7z container codec (X10 stretch): writer/reader round
trips, the LZMA coder paths the writer itself never emits (hand-assembled
archives), encoded headers, the unsupported-coder taxonomy, and the
integration through binarchive.unpack_one."""

from __future__ import annotations

import lzma
import struct
import zlib

import pytest

from tika_addons_spark.operators import binarchive as ba
from tika_addons_spark.operators import sevenz as sz


def test_num_codec_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 123456789, 2**40, 2**55, 2**62):
        assert sz._Reader(sz._write_num(v)).num() == v, v


def test_make_7z_roundtrip_and_determinism():
    members = [
        ("a.txt", b"hello seven zip"),
        ("dir/b.bin", bytes(range(256))),
        ("empty.txt", b""),
        ("c.html", b"<html><body>doc"),
    ]
    data = sz.make_7z(members)
    assert data.startswith(sz.SIGNATURE)
    assert sz.make_7z(members) == data  # deterministic
    got = sz.list_members(data, 1 << 20)
    assert [(n, d, s) for n, d, s, _ in got] == [
        (n, d, len(d)) for n, d in members
    ]


def _lzma2_archive(name: str, payload: bytes, encoded_header: bool = False) -> bytes:
    """Hand-assemble a single-file 7z whose folder uses the LZMA2 coder —
    the shape the real 7z CLI produces — optionally with the header itself
    LZMA2-compressed (kEncodedHeader), exercising the decode paths
    make_7z's Copy writer never emits."""
    lzma2_props = bytes([18])  # dict size exponent byte
    filt = [{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 20}]
    packed = lzma.compress(payload, format=lzma.FORMAT_RAW, filters=filt)

    def streams_info(pack_sizes, unpack_sizes):
        h = bytearray()
        h += sz._write_num(sz._K_PACK_INFO)
        h += sz._write_num(0) + sz._write_num(len(pack_sizes))
        h += sz._write_num(sz._K_SIZE)
        for s in pack_sizes:
            h += sz._write_num(s)
        h += sz._write_num(sz._K_END)
        h += sz._write_num(sz._K_UNPACK_INFO)
        h += sz._write_num(sz._K_FOLDER) + sz._write_num(len(unpack_sizes))
        h.append(0)
        for _ in unpack_sizes:
            h += sz._write_num(1)
            h.append(0x21)  # id size 1 | has-attributes
            h += b"\x21" + sz._write_num(len(lzma2_props)) + lzma2_props
        h += sz._write_num(sz._K_UNPACK_SIZES)
        for s in unpack_sizes:
            h += sz._write_num(s)
        h += sz._write_num(sz._K_END) + sz._write_num(sz._K_END)
        return h

    body = bytearray()
    body += sz._write_num(sz._K_HEADER)
    body += sz._write_num(sz._K_MAIN_STREAMS)
    body += streams_info([len(packed)], [len(payload)])
    body += sz._write_num(sz._K_FILES_INFO)
    body += sz._write_num(1)
    names = b"\x00" + (name + "\x00").encode("utf-16-le")
    body += sz._write_num(sz._K_NAME) + sz._write_num(len(names)) + names
    body += sz._write_num(sz._K_END)
    body += sz._write_num(sz._K_END)
    header = bytes(body)

    archive_body = packed
    if encoded_header:
        hpacked = lzma.compress(header, format=lzma.FORMAT_RAW, filters=filt)
        enc = bytearray()
        enc += sz._write_num(sz._K_ENCODED_HEADER)
        # streams info describing the compressed header, placed AFTER the
        # file's pack stream
        enc += sz._write_num(sz._K_PACK_INFO)
        enc += sz._write_num(len(packed)) + sz._write_num(1)
        enc += sz._write_num(sz._K_SIZE) + sz._write_num(len(hpacked))
        enc += sz._write_num(sz._K_END)
        enc += sz._write_num(sz._K_UNPACK_INFO)
        enc += sz._write_num(sz._K_FOLDER) + sz._write_num(1)
        enc.append(0)
        enc += sz._write_num(1)
        enc.append(0x21)
        enc += b"\x21" + sz._write_num(len(lzma2_props)) + lzma2_props
        enc += sz._write_num(sz._K_UNPACK_SIZES) + sz._write_num(len(header))
        enc += sz._write_num(sz._K_END) + sz._write_num(sz._K_END)
        archive_body = packed + hpacked
        header = bytes(enc)

    start_header = (
        struct.pack("<Q", len(archive_body))
        + struct.pack("<Q", len(header))
        + struct.pack("<I", zlib.crc32(header))
    )
    return (
        sz.SIGNATURE + b"\x00\x04"
        + struct.pack("<I", zlib.crc32(start_header))
        + start_header + bytes(archive_body) + header
    )


def test_lzma2_coder_decodes():
    payload = b"the same sentence repeated " * 50
    data = _lzma2_archive("doc.txt", payload)
    assert len(data) < len(payload)  # actually compressed
    got = sz.list_members(data, 1 << 20)
    assert got == [("doc.txt", payload, len(payload), payload[:265])]


def test_encoded_header_decodes():
    payload = b"content behind a compressed header " * 20
    data = _lzma2_archive("x.txt", payload, encoded_header=True)
    got = sz.list_members(data, 1 << 20)
    assert [(n, d) for n, d, _, _ in got] == [("x.txt", payload)]


def test_lzma2_bomb_respects_member_cap():
    bomb = _lzma2_archive("big.bin", b"\x00" * (8 << 20))
    assert len(bomb) < 64 * 1024
    got = sz.list_members(bomb, 1 << 20)
    (name, d, size, head) = got[0]
    assert d is None and size == 8 << 20  # declared size, no materialization


def test_unsupported_coder_raises_typed():
    # AES-256 coder id (06 F1 07 01) — valid 7z, not implemented here
    data = bytearray(sz.make_7z([("a", b"x")]))
    # corrupt-free way: build header with a bogus coder via the test helper
    h = bytearray()
    h += sz._write_num(sz._K_HEADER)
    h += sz._write_num(sz._K_MAIN_STREAMS)
    h += sz._write_num(sz._K_PACK_INFO)
    h += sz._write_num(0) + sz._write_num(1)
    h += sz._write_num(sz._K_SIZE) + sz._write_num(1)
    h += sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_UNPACK_INFO)
    h += sz._write_num(sz._K_FOLDER) + sz._write_num(1)
    h.append(0)
    h += sz._write_num(1)
    h.append(0x04)  # id size 4, simple, no attrs
    h += bytes.fromhex("06f10701")
    h += sz._write_num(sz._K_UNPACK_SIZES) + sz._write_num(1)
    h += sz._write_num(sz._K_END) + sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_END)
    header = bytes(h)
    start_header = (
        struct.pack("<Q", 1) + struct.pack("<Q", len(header))
        + struct.pack("<I", zlib.crc32(header))
    )
    arch = (
        sz.SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(start_header))
        + start_header + b"\x00" + header
    )
    with pytest.raises(sz.UnsupportedCoder):
        sz.list_members(arch, 1 << 20)
    # through unpack_one: the taxonomy is 'unsupported', not corrupt
    rows = ba.unpack_one("enc", arch, max_depth=3)
    assert len(rows) == 1 and rows[0]["status"] == "unsupported"
    assert rows[0]["detected_type"] == ba.MIME_7Z


def test_unpack_one_7z_and_nesting():
    inner = sz.make_7z([("t.txt", b"leaf text"), ("p.pdf", b"%PDF-1.4\nx")])
    rows = ba.unpack_one("arc", inner, max_depth=3)
    assert sorted(r["member_text"] for r in rows) == ["%PDF-1.4\nx", "leaf text"]
    assert all(r["status"] == "ok" for r in rows)
    # 7z nested inside a zip expands like any other container
    z = ba.make_zip([("in.7z", inner), ("note", b"zip-level note")])
    rows = ba.unpack_one("outer", z, max_depth=4)
    leaves = sorted(r["member_text"] for r in rows if not r["is_container"])
    assert leaves == ["%PDF-1.4\nx", "leaf text", "zip-level note"]
    # corrupt 7z → corrupt status row, never a raise
    bad = sz.SIGNATURE + b"\x00\x04" + b"\x00" * 26
    rows = ba.unpack_one("bad", bad, max_depth=3)
    assert len(rows) == 1 and rows[0]["status"].startswith("corrupt:")


def _raw_header_archive(header: bytes, body: bytes = b"") -> bytes:
    """Wrap an already-built raw header property tree into a full archive."""
    start_header = (
        struct.pack("<Q", len(body)) + struct.pack("<Q", len(header))
        + struct.pack("<I", zlib.crc32(header))
    )
    return (
        sz.SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(start_header))
        + start_header + body + header
    )


def test_implausible_file_count_rejected():
    """A ~40-byte archive declaring 2^40 files must raise Bad7z BEFORE
    allocating per-file lists (r4 advice: attacker-controlled counts)."""
    h = bytearray()
    h += sz._write_num(sz._K_HEADER)
    h += sz._write_num(sz._K_FILES_INFO)
    h += sz._write_num(2**40)  # declared file count >> header bytes
    h += sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_END)
    with pytest.raises(sz.Bad7z, match="implausible"):
        sz.list_members(_raw_header_archive(bytes(h)), 1 << 20)


def test_bad_name_encoding_raises_bad7z():
    """Lone-surrogate / odd-length UTF-16 name blobs must raise the typed
    Bad7z, not UnicodeDecodeError (r4 advice: list_members' contract)."""
    for blob in (b"\x00" + b"\x00\xd8\x00\x00",   # lone surrogate
                 b"\x00" + b"a\x00b"):            # odd-length payload
        h = bytearray()
        h += sz._write_num(sz._K_HEADER)
        h += sz._write_num(sz._K_FILES_INFO)
        h += sz._write_num(1)
        h += sz._write_num(sz._K_NAME)
        h += sz._write_num(len(blob))
        h += blob
        h += sz._write_num(sz._K_END)
        h += sz._write_num(sz._K_END)
        with pytest.raises(sz.Bad7z, match="name"):
            sz.list_members(_raw_header_archive(bytes(h)), 1 << 20)


def test_negative_substream_sizes_rejected():
    """Declared per-substream sizes exceeding the folder's unpack size must
    raise Bad7z instead of emitting negative-size 'ok' rows (r4 advice)."""
    body = b"ABCD"
    h = bytearray()
    h += sz._write_num(sz._K_HEADER)
    h += sz._write_num(sz._K_MAIN_STREAMS)
    h += sz._write_num(sz._K_PACK_INFO)
    h += sz._write_num(0) + sz._write_num(1)          # pos, 1 pack stream
    h += sz._write_num(sz._K_SIZE) + sz._write_num(len(body))
    h += sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_UNPACK_INFO)
    h += sz._write_num(sz._K_FOLDER) + sz._write_num(1)
    h.append(0)                                        # not external
    h += sz._write_num(1)                              # one coder
    h.append(0x01)                                     # id size 1
    h += sz._COPY
    h += sz._write_num(sz._K_UNPACK_SIZES) + sz._write_num(len(body))
    h += sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_SUBSTREAMS)
    h += sz._write_num(sz._K_NUM_UNPACK_STREAM) + sz._write_num(2)
    h += sz._write_num(sz._K_SIZE) + sz._write_num(10)  # 10 > folder's 4
    h += sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_END)
    with pytest.raises(sz.Bad7z, match="substream sizes"):
        sz.list_members(_raw_header_archive(bytes(h), body), 1 << 20)


def test_directories_skipped_empty_files_kept():
    """Empty-stream entries WITHOUT the kEmptyFile bit are directories and
    must be skipped (matching zip/tar member filtering); WITH the bit they
    are zero-byte files (r4 advice). make_7z marks its empties as files."""
    # make_7z path: empty member round-trips as a zero-byte FILE
    got = sz.list_members(sz.make_7z([("e.txt", b""), ("a", b"x")]), 1 << 20)
    assert [(n, d) for n, d, _, _ in got] == [("e.txt", b""), ("a", b"x")]

    # hand-built: two empty-stream entries, only the second marked kEmptyFile
    names_blob = b"\x00" + "".join(
        n + "\x00" for n in ("somedir", "empty.txt")
    ).encode("utf-16-le")
    h = bytearray()
    h += sz._write_num(sz._K_HEADER)
    h += sz._write_num(sz._K_FILES_INFO)
    h += sz._write_num(2)
    h += sz._write_num(sz._K_EMPTY_STREAM) + sz._write_num(1) + b"\xc0"
    h += sz._write_num(sz._K_EMPTY_FILE) + sz._write_num(1) + b"\x40"
    h += sz._write_num(sz._K_NAME) + sz._write_num(len(names_blob)) + names_blob
    h += sz._write_num(sz._K_END)
    h += sz._write_num(sz._K_END)
    got = sz.list_members(_raw_header_archive(bytes(h)), 1 << 20)
    assert [(n, d, s) for n, d, s, _ in got] == [("empty.txt", b"", 0)]
