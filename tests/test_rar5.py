"""RAR5 container reader: header walk + stored-member extraction per the
public rarlab technote layout, CRC enforcement, bomb bounds, the
proprietary-compression unsupported taxonomy, and binarchive wiring."""

from __future__ import annotations

import random
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tika_addons_spark.operators import binarchive as ba
from tika_addons_spark.operators import rar5


MEMBERS = [
    ("a.txt", b"hello rar world"),
    ("dir/b.xml", b'<?xml version="1.0"?><r/>'),
    ("c.bin", bytes(range(256)) * 4),
    ("empty", b""),
]


def test_stored_roundtrip():
    blob = rar5.make_rar5(MEMBERS)
    assert blob.startswith(rar5.MAGIC5)
    got = rar5.list_members(blob)
    assert [(m.name, m.payload) for m in got] == MEMBERS
    assert all(m.status == "ok" and m.method == 0 for m in got)


def test_member_cap_gives_too_large_with_sniff_head():
    blob = rar5.make_rar5(MEMBERS)
    got = rar5.list_members(blob, max_member_bytes=20)
    by = {m.name: m for m in got}
    assert by["a.txt"].status == "ok"
    assert by["c.bin"].status == "too-large"
    assert by["c.bin"].payload is None
    assert by["c.bin"].head == (bytes(range(256)) * 4)[:265]
    assert by["c.bin"].size == 1024  # declared size still reported


def test_compressed_member_is_unsupported_metadata_row():
    """Flip a stored member's compression-info method bits to 3 (the
    proprietary algorithm): the parser must keep the metadata but refuse
    the bytes — and re-CRC the header so the block still validates."""
    nb = b"x.dat"
    payload = b"pretend-compressed-bytes"
    body = (
        rar5._vint(rar5._FFL_CRC32)
        + rar5._vint(1000)  # unpacked size differs from data size
        + rar5._vint(0x20)
        + zlib.crc32(payload).to_bytes(4, "little")
        + rar5._vint(3 << 7)  # method 3, v5.0
        + rar5._vint(1)
        + rar5._vint(len(nb))
        + nb
    )
    hdr = rar5._vint(rar5._T_FILE) + rar5._vint(rar5._HFL_DATA) + rar5._vint(
        len(payload)
    ) + body
    sized = rar5._vint(len(hdr)) + hdr
    end_hdr = rar5._vint(rar5._T_END) + rar5._vint(0) + rar5._vint(0)
    end_sized = rar5._vint(len(end_hdr)) + end_hdr
    blob = (
        rar5.MAGIC5
        + zlib.crc32(sized).to_bytes(4, "little") + sized + payload
        + zlib.crc32(end_sized).to_bytes(4, "little") + end_sized
    )
    (m,) = rar5.list_members(blob)
    assert m.name == "x.dat"
    assert m.status == "unsupported"
    assert m.payload is None
    assert m.size == 1000
    assert m.method == 3


def test_every_bitflip_is_caught_or_parses():
    """Header CRCs make the whole container tamper-evident: single-bit
    corruption anywhere after the signature raises BadRar (or, for data
    bytes, fails the member CRC)."""
    blob = rar5.make_rar5(MEMBERS[:3])
    for t in range(400):
        rng = random.Random(t)
        b = bytearray(blob)
        b[rng.randrange(8, len(b))] ^= 1 << rng.randrange(8)
        with pytest.raises(rar5.BadRar):
            rar5.list_members(bytes(b))


def test_implausible_counts_bounded_by_physical_bytes():
    """A tiny header cannot demand a giant allocation: name length and
    data size are bounded by the bytes that must carry them (the 7z
    round-4 ADVICE lesson, applied here from the start)."""
    # name length 2^40 inside a 30-byte header
    nb = b"y"
    body = (
        rar5._vint(0)
        + rar5._vint(1)
        + rar5._vint(0x20)
        + rar5._vint(0)  # compression info
        + rar5._vint(1)
        + rar5._vint(1 << 40)  # absurd name length
        + nb
    )
    hdr = rar5._vint(rar5._T_FILE) + rar5._vint(0) + body
    sized = rar5._vint(len(hdr)) + hdr
    blob = rar5.MAGIC5 + zlib.crc32(sized).to_bytes(4, "little") + sized
    with pytest.raises(rar5.BadRar):
        rar5.list_members(blob)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_fuzzed_bytes_never_crash(blob):
    try:
        rar5.list_members(rar5.MAGIC5 + blob)
    except rar5.BadRar:
        pass


def test_truncated_and_missing_end():
    blob = rar5.make_rar5(MEMBERS[:1])
    with pytest.raises(rar5.BadRar):
        rar5.list_members(blob[:-3])
    with pytest.raises(rar5.BadRar):
        rar5.list_members(blob[: len(blob) - 8])  # drop the end header


def test_binarchive_rar5_unpack():
    """binarchive wiring: a RAR5 archive of real text/xml members walks
    like zip/tar — content re-detected, ok taxonomy, recursion into a
    nested zip member."""
    nested = ba.make_zip([("in.txt", b"deep text")])
    blob = rar5.make_rar5(
        [("t.txt", b"stored text member"), ("z.zip", nested)]
    )
    assert ba.detect_bytes(blob) == ba.MIME_RAR
    rows = ba.unpack_one("root.rar", blob, max_depth=3)
    by_status = {r["status"] for r in rows}
    assert by_status == {"ok"}
    texts = {r["member_text"] for r in rows}
    assert "stored text member" in texts and "deep text" in texts


def test_binarchive_mixed_stored_and_compressed():
    """A stored member extracts; a compressed sibling surfaces as an
    unsupported metadata row with its declared size and no bytes."""
    stored = rar5.make_rar5([("ok.txt", b"fine")])
    # splice a handcrafted compressed-member block before the end block
    nb = b"packed.bin"
    body = (
        rar5._vint(0)
        + rar5._vint(500)
        + rar5._vint(0x20)
        + rar5._vint(2 << 7)
        + rar5._vint(1)
        + rar5._vint(len(nb))
        + nb
    )
    hdr = rar5._vint(rar5._T_FILE) + rar5._vint(0) + body
    sized = rar5._vint(len(hdr)) + hdr
    block = zlib.crc32(sized).to_bytes(4, "little") + sized
    # end block = crc(4) + size vint(1) + [type,flags,endflags](3) = 8 bytes
    end_at = len(stored) - 8
    blob = stored[:end_at] + block + stored[end_at:]
    rows = ba.unpack_one("mixed.rar", blob, max_depth=2)
    by = {r["status"]: r for r in rows}
    assert by["ok"]["member_text"] == "fine"
    assert by["unsupported"]["n_bytes"] == 500
    assert by["unsupported"]["member_bytes"] is None


def test_binarchive_rar4_stays_detect_only():
    rar4 = b"Rar!\x1a\x07\x00" + b"\x00" * 16
    rows = ba.unpack_one("old.rar", rar4, max_depth=2)
    assert len(rows) == 1 and rows[0]["status"] == "unsupported"
    assert rows[0]["detected_type"] == ba.MIME_RAR


# ---- round-6 ADVICE items: lenient service records, name/extra bound ------


def _emit_block(out: bytearray, htype: int, hflags: int, body: bytes,
                payload: bytes = b"") -> None:
    hdr = rar5._vint(htype) + rar5._vint(hflags)
    if hflags & 0x02:
        hdr += rar5._vint(len(payload))
    hdr += body
    sized = rar5._vint(len(hdr)) + hdr
    out.extend(zlib.crc32(sized).to_bytes(4, "little"))
    out.extend(sized)
    out.extend(payload)


def test_service_record_with_size_mismatch_is_skipped_not_corrupt():
    """Real WinRAR emits service records (recovery/quick-open) whose
    stored-size rules differ from file entries; a strict _parse_file used
    to mark the WHOLE archive corrupt. They must be skipped leniently."""
    out = bytearray(rar5.MAGIC5)
    _emit_block(out, rar5._T_MAIN, 0, rar5._vint(0))
    # service record: method 0 but declared unp_size != data_size
    svc_payload = b"svc"
    svc_body = (
        rar5._vint(0)              # file flags: nothing optional
        + rar5._vint(5)            # unpacked size 5 != data size 3
        + rar5._vint(0x20)         # attributes
        + rar5._vint(0)            # compression info: store
        + rar5._vint(1)            # host OS
        + rar5._vint(3) + b"RR\x00"[:3]
    )
    _emit_block(out, rar5._T_SERVICE, 0x02, svc_body, svc_payload)
    # then a perfectly normal file member
    fdata = b"real member"
    fbody = (
        rar5._vint(0x04)           # FFL_CRC32
        + rar5._vint(len(fdata))
        + rar5._vint(0x20)
        + zlib.crc32(fdata).to_bytes(4, "little")
        + rar5._vint(0)
        + rar5._vint(1)
        + rar5._vint(5) + b"f.txt"
    )
    _emit_block(out, rar5._T_FILE, 0x02, fbody, fdata)
    _emit_block(out, rar5._T_END, 0, rar5._vint(0))

    got = rar5.list_members(bytes(out))
    assert [ (m.name, m.payload, m.status) for m in got ] == [
        ("f.txt", fdata, "ok")
    ]


def test_service_record_with_bad_name_encoding_is_skipped():
    out = bytearray(rar5.MAGIC5)
    _emit_block(out, rar5._T_MAIN, 0, rar5._vint(0))
    svc_body = (
        rar5._vint(0)
        + rar5._vint(0)
        + rar5._vint(0x20)
        + rar5._vint(0)
        + rar5._vint(1)
        + rar5._vint(2) + b"\xff\xfe"   # invalid utf-8 name
    )
    _emit_block(out, rar5._T_SERVICE, 0, svc_body)
    _emit_block(out, rar5._T_END, 0, rar5._vint(0))
    assert rar5.list_members(bytes(out)) == []


def test_file_name_may_not_overlap_extra_area():
    """A CRC-valid crafted header whose name length reaches into the extra
    area must be rejected (the extra bytes are re-parsed for encryption
    records and may not double as name bytes)."""
    out = bytearray(rar5.MAGIC5)
    _emit_block(out, rar5._T_MAIN, 0, rar5._vint(0))
    extra = b"\x05\x01AAAA"  # one extra record: size 5, type 1 + 4 bytes
    body_after_extra_size = (
        rar5._vint(0)              # file flags
        + rar5._vint(0)            # unpacked size
        + rar5._vint(0x20)         # attributes
        + rar5._vint(0)            # compression info: store
        + rar5._vint(1)            # host OS
        + rar5._vint(4 + len(extra)) + b"name"  # nlen overlaps the extra area
        + extra
    )
    hdr = (
        rar5._vint(rar5._T_FILE)
        + rar5._vint(0x01)               # _HFL_EXTRA
        + rar5._vint(len(extra))         # extra area size
        + body_after_extra_size
    )
    sized = rar5._vint(len(hdr)) + hdr
    out.extend(zlib.crc32(sized).to_bytes(4, "little"))
    out.extend(sized)
    _emit_block(out, rar5._T_END, 0, rar5._vint(0))
    with pytest.raises(rar5.BadRar):
        rar5.list_members(bytes(out))
