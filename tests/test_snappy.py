"""Snappy raw + framed codec: round trips, REAL external validation
against the JVM ``snappy-java`` library bundled with Spark (raw AND
framed, both directions), CRC32C vectors, bounded-output bomb posture,
malformed-input taxonomy, and the binarchive wiring."""

from __future__ import annotations

import os
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tika_addons_spark.operators import binarchive as ba
from tika_addons_spark.operators import snappyf as sf


def _corpus(rng: random.Random) -> list[bytes]:
    return [
        b"",
        b"a",
        b"abcd",
        b"hello snappy world",
        b"abcabcabc" * 50,  # short-offset overlapping copies
        b"the quick brown fox jumps over the lazy dog. " * 300,
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        bytes(rng.randrange(4) for _ in range(100000)),  # >64KiB, 2 chunks
        b"\x00" * 70000,  # offset-1 runs split across chunk boundary
        (b"A" * 300 + b"B") * 500,  # >60-literal extension bytes, long copies
    ]


def test_crc32c_public_vector():
    assert sf.crc32c(b"123456789") == 0xE3069283
    assert sf.crc32c(b"") == 0


def test_raw_roundtrip():
    rng = random.Random(1)
    for data in _corpus(rng):
        assert sf.uncompress_raw(sf.compress_raw(data)) == data, len(data)


def test_framed_roundtrip_and_bounds():
    rng = random.Random(2)
    for data in _corpus(rng):
        frame = sf.compress(data)
        assert frame.startswith(sf.MAGIC)
        out, over = sf.decompress(frame, 10_000_000)
        assert not over and out == data, len(data)
        if len(data) > 10:
            cap = len(data) // 2
            out2, over2 = sf.decompress(frame, cap)
            assert over2 and out2 == data[:cap], len(data)


def test_skippable_and_padding_chunks():
    data = b"payload across decorations"
    frame = bytearray(sf.compress(data))
    # append a padding chunk and a skippable chunk, then more data
    frame += b"\xfe" + (4).to_bytes(3, "little") + b"\x00" * 4
    frame += b"\x80" + (2).to_bytes(3, "little") + b"hi"
    more = sf.compress(b" and more")[len(sf.MAGIC):]  # chunks only
    frame += more
    out, over = sf.decompress(bytes(frame), 10_000)
    assert not over and out == data + b" and more"


def test_malformed_inputs_raise_badsnappy():
    data = b"abcabcabc" * 40
    good = sf.compress(data)
    with pytest.raises(sf.BadSnappy):
        sf.decompress(b"\x00" + good[1:], 10_000)  # bad magic
    with pytest.raises(sf.BadSnappy):
        sf.decompress(good[:-3], 10_000)  # truncated chunk
    bad_crc = bytearray(good)
    bad_crc[len(sf.MAGIC) + 4] ^= 0xFF  # CRC byte of first data chunk
    with pytest.raises(sf.BadSnappy):
        sf.decompress(bytes(bad_crc), 10_000)
    with pytest.raises(sf.BadSnappy):
        # reserved unskippable chunk type
        sf.decompress(sf.MAGIC + b"\x02" + (1).to_bytes(3, "little") + b"x",
                      10_000)


def test_declared_size_checked_before_decode():
    """A raw block declaring more than the limit refuses before decoding
    (bomb posture at the block layer)."""
    raw = sf.compress_raw(b"\x00" * 50000)
    with pytest.raises(sf.BadSnappy):
        sf.uncompress_raw(raw, limit=1000)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400))
def test_fuzzed_bytes_never_crash(blob):
    try:
        out, _ = sf.decompress(sf.MAGIC + blob, 100_000)
        assert len(out) <= 100_000
    except sf.BadSnappy:
        pass


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=2000))
def test_property_roundtrip(data):
    back, over = sf.decompress(sf.compress(data), 10_000_000)
    assert not over and back == data


def test_jvm_snappyjava_cross_validation(spark):
    """REAL external compatibility against org.xerial.snappy (the
    snappy-java jar Spark ships), both directions and both layers:
    raw Snappy.compress/uncompress and the SnappyFramed streams."""
    jvm = spark._jvm
    rng = random.Random(3)
    cases = [c for c in _corpus(rng) if c]

    for data in cases:
        jraw = bytes(jvm.org.xerial.snappy.Snappy.compress(bytearray(data)))
        assert sf.uncompress_raw(jraw) == data, len(data)
        back = bytes(
            jvm.org.xerial.snappy.Snappy.uncompress(bytearray(sf.compress_raw(data)))
        )
        assert back == data, len(data)

        baos = jvm.java.io.ByteArrayOutputStream()
        fos = jvm.org.xerial.snappy.SnappyFramedOutputStream(baos)
        fos.write(bytearray(data))
        fos.close()
        ours, over = sf.decompress(bytes(baos.toByteArray()), 10_000_000)
        assert not over and ours == data, len(data)

        fis = jvm.org.xerial.snappy.SnappyFramedInputStream(
            jvm.java.io.ByteArrayInputStream(bytearray(sf.compress(data)))
        )
        got = bytes(fis.readAllBytes())
        fis.close()
        assert got == data, len(data)


def test_binarchive_detect_and_unpack_snappy():
    inner = ba.make_tar([("a.txt", b"hello sz member")])
    payload = sf.compress(inner)
    assert ba.detect_bytes(payload) == ba.MIME_SNAPPY
    rows = ba.unpack_one("root.sz", payload, max_depth=3)
    assert {r["status"] for r in rows} == {"ok"}
    assert "hello sz member" in {r["member_text"] for r in rows}


def test_binarchive_snappy_bomb_cap():
    payload = sf.compress(b"\x00" * 1_000_000)
    rows = ba.unpack_one("bomb.sz", payload, max_member_bytes=10_000)
    assert [r["status"] for r in rows] == ["too-large"]
    assert rows[0]["member_bytes"] is None


def test_every_bitflip_bounded_or_caught():
    """400 single-bit flips of a VALID framed stream (the rar5-style
    gate): per-chunk masked CRC32C catches payload flips as BadSnappy;
    any flip that still decodes (e.g. in a skippable-chunk region) must
    stay within the output bound."""
    import random

    data = (b"the quick brown fox jumps over the lazy dog " * 300)[:12_000]
    blob = sf.compress(data)
    cap = len(data) * 4
    for t in range(400):
        rng = random.Random(t)
        b = bytearray(blob)
        b[rng.randrange(0, len(b))] ^= 1 << rng.randrange(8)
        try:
            out, over = sf.decompress(bytes(b), cap)
        except sf.BadSnappy:
            continue
        assert len(out) <= cap + 1
