"""Round-6 focused test: the plain/xml lane split in extract_arrow
(vectorized small lane + per-row Python whale lane with the prefix fast
path) must be byte-identical to the canonical oracle for every row shape,
especially the edge cases the whale fast path reasons about:

- rows just above/below MAX_EXTRACTED_CHARS and _BIG_ROW_CODEPOINTS
- specials (\\x00, \\t, \\r, \\n\\n) before, at, and after the MAX+1
  prefix boundary
- trailing whitespace runs that cross the truncation boundary (the case
  where a naive prefix probe would mis-declare truncation)
- only-whitespace whales, multibyte codepoints around the boundary
"""

from __future__ import annotations

import pyarrow as pa

from tika_addons_spark.operators import extract_arrow as ea
from tika_addons_spark.oracle import MAX_EXTRACTED_CHARS, extract_one

MAX = MAX_EXTRACTED_CHARS
BIG = ea._BIG_ROW_CODEPOINTS


def _rows():
    a = "a"
    return [
        None,
        "",
        "   ",
        "short row",
        " pad \n\nmid ",
        a * (BIG - 1),
        a * BIG,
        a * (BIG + 1),
        a * MAX,
        a * (MAX + 1),
        a * (MAX + 50),
        # trailing-ws crossing the boundary: cleaned length is exactly MAX
        a * MAX + " " * 2000,
        a * MAX + " " * 2000 + "\x00",
        a * (MAX - 1) + " " * 5000,
        # specials beyond the MAX+1 prefix only
        a * (MAX + 10) + "\t\r\x00\n\n" + a * 100,
        # specials inside the prefix
        a * 50000 + "\n\n" + a * 60000,
        a * 50000 + "\t" + a * 60000,
        a * 50000 + "\x00" + a * 60000,
        # leading ws on a whale
        " " * 3000 + a * (MAX + 10),
        "\n" * 3000 + a * (MAX + 10),
        # only-ws whale
        " " * (BIG + 10),
        "\n" * (BIG + 10),
        # multibyte around the boundary
        "é" * (MAX + 5),
        "𝄞" * 70000,
        ("x" * 99999) + "é" + "z" * 50,
        # \n\n straddling the prefix boundary
        a * MAX + "\n\n" + a * 10,
        (a * (MAX - 1)) + "\n\n" + a * 10,
        # mixed dirty whale
        ("word " * 25000) + "\r\n" + ("tail " * 25000),
    ]


def test_plain_lane_split_matches_oracle():
    rows = _rows()
    arr = pa.array(rows, pa.string())
    cols = ea._extract_plain_arrow(arr)
    texts = cols["extracted_text"].to_pylist()
    statuses = cols["parse_status"].to_pylist()
    couts = cols["chars_out"].to_pylist()
    cins = cols["chars_in"].to_pylist()
    warns = cols["warnings"].to_pylist()
    for i, r in enumerate(rows):
        exp = extract_one(r)
        assert texts[i] == exp["extracted_text"], f"text row {i}"
        assert statuses[i] == exp["parse_status"], f"status row {i}"
        assert couts[i] == exp["chars_out"], f"chars_out row {i}"
        assert cins[i] == exp["chars_in"], f"chars_in row {i}"
        assert warns[i] == exp["warnings"], f"warnings row {i}"


def test_clean_plain_one_equals_oracle_text():
    for r in _rows():
        if r is None:
            continue
        exp = extract_one(r)
        got, truncated = ea._clean_plain_one(r)
        assert got == exp["extracted_text"], repr(r[:50])
        assert truncated == ("truncated" in exp["warnings"]), repr(r[:50])
