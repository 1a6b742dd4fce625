"""Round-6 focused test: the gap-tokenizer _scan must be event-identical
to the original one-regex finditer tokenizer (kept here as the reference
implementation), including the dead-selfclose semantics — '<br/>' etc.
parse as plain start tags because the greedy attrs group always consumes
the '/' (the (/?) group never captures).

Also pins the collapse_newlines gate: "\\n\\n" in text is exactly the
condition under which the \\n+ sub changes the string.
"""

from __future__ import annotations

import random
import re
from html import unescape

import pytest

from tika_addons_spark.functions.normalize import RE_NEWLINES, collapse_newlines
from tika_addons_spark.operators.html import (
    _END_ACT,
    _HEADING_TAGS,
    _RE_BZ_CONTENTTYPE,
    _START_ACT,
    _parse_attrs,
    _scan,
    BLOCK_TAGS,
    Block,
    META_FIELDS,
)

# The pre-round-6 tokenizer, verbatim: one alternation including text runs
# and the lone-'<' catch-all.
_TOKEN_RE_REF = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|</([a-zA-Z][a-zA-Z0-9:-]*)\s*[^>]*>"
    r"|<([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"
    r"|[^<]+"
    r"|<",
    re.DOTALL,
)


def _scan_reference(raw: str):
    """Reference block segmenter: the pre-round-6 finditer loop (with the
    provably-dead selfclose branches dropped; see the _TAG_RE comment in
    operators/html.py for the proof that (/?) never captures)."""
    blocks: list[Block] = []
    cur_parts: list[str] = []
    cur_start = -1
    cur_end = -1
    cur_words = 0
    cur_linkwords = 0
    cur_heading = False
    cur_attach = False
    title_parts: list[str] = []
    title_span = None
    meta: dict[str, str] = {}
    skip_depth = 0
    boiler_depth = 0
    anchor_depth = 0
    in_title = False
    attach_rows: list[str] = []
    row_ct: str | None = None
    in_attach_row = False
    row_parts: list[str] = []

    for m in _TOKEN_RE_REF.finditer(raw):
        li = m.lastindex
        if li is None:
            tok = m.group()
            if tok[0] == "<" and len(tok) > 1:
                continue  # comment / doctype / PI / CDATA
            if skip_depth or boiler_depth:
                continue
            decoded = unescape(tok) if "&" in tok else tok
            s, e = m.span()
            if in_title:
                title_parts.append(decoded)
                if title_span is None:
                    title_span = [s, e]
                else:
                    title_span[1] = e
                continue
            if in_attach_row:
                row_parts.append(decoded)
            if cur_start < 0:
                cur_start = s
            cur_end = e
            cur_parts.append(decoded)
            w = len(decoded.split())
            cur_words += w
            if anchor_depth:
                cur_linkwords += w
            continue

        if li == 1:  # end tag
            tag = m.group(1).lower()
            act = _END_ACT.get(tag)
            if act is not None:
                if act == 3:
                    if anchor_depth:
                        anchor_depth -= 1
                    continue
                if act == 1:
                    if skip_depth:
                        skip_depth -= 1
                    continue
                if act == 2:
                    if boiler_depth:
                        boiler_depth -= 1
                    continue
                if act == 4:
                    in_title = False
                elif act == 7:
                    if in_attach_row:
                        row_parts.append(" ")
                elif in_attach_row:  # act == 6: </tr>
                    row_text = " ".join("".join(row_parts).split())
                    if row_ct and row_text:
                        attach_rows.append(f"{row_text} [{row_ct}]")
                    in_attach_row = False
                    row_ct = None
                    row_parts = []
            if tag in BLOCK_TAGS:
                if cur_parts:
                    txt = " ".join("".join(cur_parts).split())
                    if txt:
                        blocks.append(Block(
                            txt, cur_start, cur_end, cur_words,
                            cur_linkwords, cur_heading, cur_attach,
                        ))
                    cur_parts = []
                    cur_start = -1
                    cur_words = 0
                    cur_linkwords = 0
                cur_heading = False
                cur_attach = False
            continue

        # start tag
        tag, raw_attrs = m.group(2, 3)
        tag = tag.lower()
        act = _START_ACT.get(tag)
        if act is not None:
            if act == 3:
                anchor_depth += 1
                continue
            if act == 1:
                skip_depth += 1
                continue
            if act == 2:
                boiler_depth += 1
                continue
            if act == 4:
                in_title = True
            elif act == 5:
                if raw_attrs:
                    a = dict(_parse_attrs(raw_attrs))
                    name = (a.get("name") or "").lower()
                    if name in META_FIELDS and a.get("content"):
                        meta[name] = a["content"]
                continue
            else:  # act == 6
                if raw_attrs and (
                    "bz_contenttype_" in raw_attrs or "&" in raw_attrs
                ):
                    cls = dict(_parse_attrs(raw_attrs)).get("class") or ""
                    mm = _RE_BZ_CONTENTTYPE.search(cls)
                    row_ct = mm.group(1).replace("_", "/", 1) if mm else None
                else:
                    row_ct = None
                in_attach_row = row_ct is not None
                row_parts = []
        if tag in BLOCK_TAGS:
            if cur_parts:
                txt = " ".join("".join(cur_parts).split())
                if txt:
                    blocks.append(Block(
                        txt, cur_start, cur_end, cur_words,
                        cur_linkwords, cur_heading, cur_attach,
                    ))
                cur_parts = []
                cur_start = -1
                cur_words = 0
                cur_linkwords = 0
            cur_heading = tag in _HEADING_TAGS
            cur_attach = in_attach_row

    if cur_parts:
        txt = " ".join("".join(cur_parts).split())
        if txt:
            blocks.append(Block(
                txt, cur_start, cur_end, cur_words,
                cur_linkwords, cur_heading, cur_attach,
            ))
    return blocks, title_parts, title_span, meta, attach_rows


def _norm(res):
    blocks, title_parts, title_span, meta, attach_rows = res
    return (
        [
            (b.text, b.start, b.end, b.n_words, b.n_link_words,
             b.is_heading, b.in_attach_row)
            for b in blocks
        ],
        title_parts,
        title_span,
        meta,
        attach_rows,
    )


FRAGMENTS = [
    "<div>", "</div>", "<p>", "</p>", "<a href=x>", "</a>",
    '<a href="q>z">', "</A>", "<DIV>", "<br/>", "<img src=y/>",
    "<!-- comment -->", "<!--unterminated", "<![CDATA[x]]>", "<![CDATA[open",
    "<!doctype html>", "<?pi x?>", "<?php", "text word", "&amp; &lt;",
    "<", ">", "</", "</ div>", "</3>", "<3>", "<<", "<a", "</a",
    "<title>", "</title>", "<meta name=author content=bob>",
    "<meta name='creator' content='c&amp;o'>",
    '<tr class="bz_contenttype_text_html">', "</tr>", "<td>", "</td>",
    "<script>", "</script>", "<nav>", "</nav>", "<b", "\n  ", "\t",
    "<h1>", "</h1>", "<ul>", "<li>", "</li>", "</ul>",
    '<a href="unterminated', "<span a=b c=/>", "</span junk>",
    "<em²>", "</em²>", "<x:y>", "</x:y>", "<x-y attr>",
    "\x00", "é&eacute;", "ab<cd", "x&am<p;y", "< div>",
    '<a b=c"def>', "word< word", "<tr>", "<table>", "</table>",
    "<form>", "</form>", "<aside>", "</aside>", "<nav/>", "<script/>",
    "<a/>", "<title/>", "<style>", "</style>", "<pre>", "</pre>",
]


def test_scan_equals_reference_adversarial():
    rng = random.Random(7)
    for _ in range(8000):
        k = rng.randint(0, 14)
        s = "".join(rng.choice(FRAGMENTS) for _ in range(k))
        assert _norm(_scan(s)) == _norm(_scan_reference(s)), repr(s)


def test_scan_equals_reference_fixture_corpus():
    from tika_addons_spark.fixtures import conversation_rows
    from tika_addons_spark.functions import sniff

    n = 0
    for c in range(400):
        for r in conversation_rows(c, seed=11):
            t = r["text"]
            if t and sniff.sniff_one(t) == sniff.MIME_HTML:
                assert _norm(_scan(t)) == _norm(_scan_reference(t))
                n += 1
    assert n > 100  # the fixture mix must actually exercise the kernel


def test_collapse_newlines_gate_exactness():
    cases = [
        "", "a", "a\nb", "a\n\nb", "\n", "\n\n", "  x  ", "\na\n",
        "a\n\n\n\nb\n\n", "\t\na\r\n\nb", "x" * 5 + "\n" * 7 + "y",
        "no newlines at all", "\n\nlead", "trail\n\n",
    ]
    for t in cases:
        assert collapse_newlines(t) == RE_NEWLINES.sub("\n", t).strip()
