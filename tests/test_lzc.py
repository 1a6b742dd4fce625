"""Unix .Z (compress) LZW codec: round trips, REAL external validation
against the system ``uncompress`` tool, bounded-output bomb posture, and
the binarchive wiring."""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tika_addons_spark.operators import binarchive as ba
from tika_addons_spark.operators import lzc


def test_roundtrip_across_widths_and_clears():
    rng = random.Random(1)
    cases = [
        b"", b"a", b"aaaa", b"abcabc" * 20,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"the quick brown fox " * 400,          # crosses 9->10->11 bits
        bytes(rng.randrange(4) for _ in range(200000)),  # many widths
        b"\x00" * 70000,
        bytes(rng.randrange(256) for _ in range(150000)),  # fills 16-bit dict
    ]
    for c in cases:
        for kw in ({}, {"maxbits": 12}, {"clear_every": 300}):
            z = lzc.compress(c, **kw)
            assert z[:2] == lzc.MAGIC
            back, overflowed = lzc.decompress(z, 10_000_000)
            assert not overflowed and back == c, (len(c), kw)


@pytest.mark.skipif(
    shutil.which("uncompress") is None, reason="no uncompress binary"
)
def test_encoder_accepted_by_real_uncompress(tmp_path):
    """External compatibility: the system uncompress (gzip's unlzw) must
    reproduce the input from OUR .Z bytes — this pins the width-change
    timing (compress.c checks before the table insert) and the
    8-codes-per-width group padding against a real implementation, not
    just our own decoder."""
    rng = random.Random(2)
    cases = [
        b"hello .Z world",
        b"the quick brown fox " * 400,
        bytes(rng.randrange(256) for _ in range(6000)),
        bytes(rng.randrange(4) for _ in range(120000)),
    ]
    for i, c in enumerate(cases):
        for kw in ({}, {"maxbits": 12}, {"clear_every": 500}):
            path = tmp_path / f"t{i}.Z"
            path.write_bytes(lzc.compress(c, **kw))
            r = subprocess.run(
                ["uncompress", "-c", str(path)], capture_output=True
            )
            assert r.returncode == 0 and r.stdout == c, (i, kw, r.stderr[:80])


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_decoder_total_on_garbage(data):
    """Arbitrary bytes behind the magic raise ONLY BadLzc (or decode),
    and unpack_one maps them to status rows, never failures."""
    payload = lzc.MAGIC + data
    try:
        lzc.decompress(payload, 1 << 20)
    except lzc.BadLzc:
        pass
    rows = ba.unpack_one("g", payload, max_depth=2)
    assert all(isinstance(r["status"], str) for r in rows)


def test_unpack_one_z_wrapper_and_bomb():
    inner = ba.make_tar([("a.txt", b"hello from tar"),
                         ("b.xml", b'<?xml version="1.0"?>x')])
    rows = ba.unpack_one("t", lzc.compress(inner), max_depth=3)
    texts = sorted(r["member_text"] for r in rows if not r["is_container"])
    assert texts == ['<?xml version="1.0"?>x', "hello from tar"]
    assert ba.detect_bytes(lzc.compress(b"x")) == ba.MIME_COMPRESS

    # decompression bomb degrades to a too-large status row, never OOM
    bomb = lzc.compress(b"\x00" * (1 << 20))
    rows = ba.unpack_one("b", bomb, max_depth=2, max_member_bytes=4096)
    assert any(r["status"] == "too-large" for r in rows)

    # corrupt stream -> corrupt taxonomy
    rows = ba.unpack_one("c", b"\x1f\x9d\xff\x01\x02", max_depth=2)
    assert rows[0]["status"].startswith("corrupt:")


def test_every_bitflip_bounded_or_caught():
    """400 single-bit flips of a VALID .Z stream (the rar5-style gate):
    .Z has no integrity field, so a flip may silently decode to different
    bytes — the guarantee is totality and bounded output: only BadLzc is
    ever raised and output never exceeds the limit + 1 slack byte."""
    import random

    data = (b"the quick brown fox jumps over the lazy dog " * 300)[:12_000]
    blob = lzc.compress(data)
    cap = len(data) * 4
    for t in range(400):
        rng = random.Random(t)
        b = bytearray(blob)
        b[rng.randrange(0, len(b))] ^= 1 << rng.randrange(8)
        try:
            out, over = lzc.decompress(bytes(b), cap)
        except lzc.BadLzc:
            continue
        assert len(out) <= cap + 1
