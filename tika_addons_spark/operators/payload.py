"""PDF-like payload parsing + embedded-packet span scanning (X4/X5/X8).

What the reference computes:

- X4 (``pdftotext/.../PDFToTextParser.java:205-256``): external
  ``pdftotext`` text extraction with a hard status taxonomy — we re-express
  it as an in-process parser over PDF-ish layout payloads embedded in turn
  text (no subprocesses at 100 TB scale), keeping the taxonomy.
- X5 (``pdftotext/.../ParseStatus.java:21-71``): VALIDITY ∈
  {valid, valid-warnings, rejected}; any structural damage produces warnings
  or rejection — never an exception (poison turns must not fail the job;
  pinned by ``pdftotext/src/test/java/TestMultithreaded.java:37-85``).
- X8 (``xmp-scraper/.../StreamSearcher.java:16-121``, ``XMPScraper.java``):
  single-pass stream scan for ``<?xpacket begin=`` … ``<?xpacket end…?>``
  packets, reported as (offset, payload) — our spans with exact char offsets.

Payload grammar (FIXTURES.md pdfish archetype):

    %PDF-1.x
    %%Page 1
    <text lines; a line ending '-' wraps into a lowercase continuation>
    <blank line = paragraph break>
    %%Page 2
    ...
    %%EOF

Dehyphenation joins ``exam-`` + ``ple`` → ``example``; in-paragraph line
breaks become single spaces; paragraphs newline-separated; pages
newline-separated.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

XPACKET_BEGIN = "<?xpacket begin="
XPACKET_END_RE = re.compile(r"<\?xpacket\s+end=[^>]*\?>")
_RE_PAGE = re.compile(r"^%%Page\s+(\d+)\s*$")


@dataclass
class PayloadResult:
    text: str
    spans: list[tuple[str, int, int]]
    warnings: list[str]
    rejected: bool
    n_pages: int


def scan_xpackets(text: str) -> list[tuple[int, int]]:
    """Single-pass scan for xpacket regions; returns [(start, end)) offsets.

    ``str.find`` is the C-speed analogue of the reference's KMP
    StreamSearcher; an unterminated packet extends to end-of-string and is
    reported (caller warns)."""
    spans = []
    pos = 0
    while True:
        start = text.find(XPACKET_BEGIN, pos)
        if start < 0:
            break
        m = XPACKET_END_RE.search(text, start + len(XPACKET_BEGIN))
        end = m.end() if m else len(text)
        spans.append((start, end))
        pos = end
    return spans


def _mask_spans(text: str, spans: list[tuple[int, int]]) -> str:
    """Replace span regions with spaces (length-preserving, so all other
    offsets stay valid)."""
    if not spans:
        return text
    out = []
    last = 0
    for s, e in spans:
        out.append(text[last:s])
        out.append(" " * (e - s))
        last = e
    out.append(text[last:])
    return "".join(out)


def _join_lines(lines: list[str]) -> str:
    """Dehyphenate + re-flow a page's lines into paragraphs."""
    paras: list[str] = []
    cur: list[str] = []
    pending_hyphen = False
    for line in lines:
        line = line.strip()
        if not line:
            if cur:
                paras.append("".join(cur))
                cur = []
            pending_hyphen = False
            continue
        if pending_hyphen and line[:1].islower():
            cur.append(line)
        else:
            if cur:
                cur.append(" ")
            cur.append(line)
        if line.endswith("-"):
            # drop the wrap hyphen; next lowercase line continues the word
            cur[-1] = cur[-1][:-1]
            pending_hyphen = True
        else:
            pending_hyphen = False
    if cur:
        paras.append("".join(cur))
    return "\n".join(paras)


def parse_payload(text: str) -> PayloadResult:
    """Parse a PDF-ish payload out of turn text. Never raises."""
    warnings: list[str] = []
    spans: list[tuple[str, int, int]] = []

    xp = scan_xpackets(text)
    for s, e in xp:
        spans.append(("xpacket", s, e))
        if e == len(text) and not XPACKET_END_RE.search(text, s):
            warnings.append("unterminated-xpacket")
    masked = _mask_spans(text, xp)

    magic = masked.find("%PDF-")
    if magic < 0:
        return PayloadResult("", spans, ["no-pdf-magic"], True, 0)
    if masked[:magic].strip():
        warnings.append("leading-garbage")

    eof = masked.find("%%EOF", magic)
    if eof < 0:
        body_end = len(masked)
        warnings.append("missing-eof")
    else:
        body_end = eof

    body = masked[magic:body_end]
    lines = body.split("\n")
    # first line is the %PDF-1.x header
    header, rest = lines[0], lines[1:]
    if not re.match(r"%PDF-\d+\.\d+", header.strip()):
        warnings.append("malformed-header")

    pages: list[list[str]] = []
    cur_page: list[str] | None = None
    stray: list[str] = []
    for line in rest:
        stripped = line.strip()
        m = _RE_PAGE.match(stripped)
        if m:
            cur_page = []
            pages.append(cur_page)
            continue
        if cur_page is None:
            if stripped:
                stray.append(line)
            continue
        cur_page.append(line)

    if not pages:
        # corrupt: magic but no page structure (testPDF_corrupt analogue)
        return PayloadResult(
            "", spans, warnings + ["corrupt-payload: no page markers"], True, 0
        )
    if stray:
        warnings.append("content-before-first-page")

    page_texts = [_join_lines(p) for p in pages]
    out = "\n".join(t for t in page_texts if t)
    if not out:
        warnings.append("empty-pages")

    first_content = magic
    spans.append(("pdf_text", first_content, body_end))
    return PayloadResult(out, spans, warnings, False, len(pages))
