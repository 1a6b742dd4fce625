"""Standalone pure-Python extraction oracle.

This is the canonical per-turn specification of the extraction pipeline: the
Spark engine (operators/extract.py) must produce byte-identical results. The
split isolates Spark-induced divergence (ordering, batching, encoding) from
extractor bugs — the strategy SURVEY.md §8 prescribes, mirroring the
reference's fixture-driven eval harness (eval-addons/.../MultiComparer.java).

Dispatch per turn, by sniffed content type:

- text/html → density-based boilerplate strip (operators/html.py, X1/X2)
- application/pdf → payload parse + xpacket spans (operators/payload.py, X4/X8)
- application/x-dwg-mtext → 5-pass markup-code cascade (functions/cleaners.py, F7)
- application/zip, application/gzip (base64 data-URI attachments) → decode,
  unpack real bytes (operators/binarchive.py, X10), extract each member with
  its own kernel, join in member order — the transcript-world analogue of
  the reference's base64 bugzilla attachments + Step3Unpacker flatten
- text/plain, application/xml → F1 newline collapse + trim
- empty/null → rejected, empty output

Post-steps for every turn: sink hygiene (F8: NUL/tab/CR stripped), final F1
newline collapse, truncation guard (O5), status roll-up (X5 taxonomy).
"""

from __future__ import annotations

from typing import Any

from .functions import cleaners, normalize, sniff
from .operators import html as html_op
from .operators import payload as payload_op
from .schema import STATUS_REJECTED, STATUS_VALID, STATUS_VALID_WARNINGS

# O5: bound output size (reference bounds sink cells/stream gobblers:
# JDBCMetadataWriter.java:111-122, StreamEater.java:49-59).
MAX_EXTRACTED_CHARS = 100_000


def _finalize(text: str) -> str:
    """F8 sink hygiene then F1 newline collapse + trim.

    Newlines are structure (paragraph/block separators) and survive; NUL,
    tab and CR do not."""
    text = text.replace("\x00", "").replace("\t", " ").replace("\r", " ")
    return normalize.collapse_newlines(text)


def _extract_archive_turn(
    text: str, ctype: str
) -> tuple[str, dict[str, str], list[tuple[str, int, int]], list[str], bool]:
    """X10 on the extraction path: a turn whose text is a base64 data-URI of
    real zip/gzip/7z bytes. Decode → unpack (binarchive, nested containers
    flatten breadth-first) → run each member through its own extraction kernel →
    join non-empty member texts with a single newline, spans = member char
    ranges in the OUTPUT (input offsets are meaningless for base64).

    Member texts are already finalized (no \\x00/\\t/\\r, no consecutive
    newlines, trimmed), so the '\\n' join is a fixed point of _finalize and
    the member spans survive the post-steps unchanged."""
    import base64

    from .operators import binarchive

    b64 = text.strip().split(",", 1)[1]
    try:
        data = base64.b64decode(b64, validate=True)
    except Exception:
        return "", {}, [], ["archive-b64-error"], True

    parts: list[str] = []
    spans: list[tuple[str, int, int]] = []
    warnings: list[str] = []
    pos = 0
    for r in binarchive.unpack_one("turn", data, max_depth=3):
        if r["status"].startswith("corrupt"):
            warnings.append("archive-corrupt")
            continue
        if r["status"] != "ok":
            warnings.append(f"archive-{r['status']}")
            continue
        if r["member_text"] is None:
            warnings.append("archive-binary-member")
            continue
        sub = extract_one(r["member_text"])
        if sub["parse_status"] == STATUS_REJECTED:
            warnings.append("archive-member-rejected")
            continue
        if sub["extracted_text"]:
            parts.append(sub["extracted_text"])
            spans.append(("member", pos, pos + len(sub["extracted_text"])))
            pos += len(sub["extracted_text"]) + 1  # '\n' joiner
    body = "\n".join(parts)
    meta = {"container": ctype, "n_members": str(len(parts))}
    rejected = len(parts) == 0
    if rejected and not warnings:
        warnings.append("archive-empty")
    return body, meta, spans, warnings, rejected


def extract_one(text: str | None) -> dict[str, Any]:
    """Extract one turn. Total function — never raises (X5)."""
    chars_in = len(text) if text is not None else 0
    ctype = sniff.sniff_one(text)
    title: str | None = None
    meta: dict[str, str] = {}
    spans: list[tuple[str, int, int]] = []
    warnings: list[str] = []
    n_pages: int | None = None
    rejected = False

    try:
        if text is None or len(text.strip()) == 0:
            body = ""
            rejected = True
            warnings.append("empty-content")
        elif ctype == sniff.MIME_HTML:
            r = html_op.extract_html(text)
            body, title, meta, spans, warnings = (
                r.text, r.title, r.meta, r.spans, list(r.warnings),
            )
            rejected = any(w.startswith("html-parse-error") for w in warnings)
        elif ctype == sniff.MIME_PDF:
            r = payload_op.parse_payload(text)
            body, spans, warnings, rejected, n_pages = (
                r.text, r.spans, list(r.warnings), r.rejected, r.n_pages,
            )
        elif ctype == sniff.MIME_MTEXT:
            body = cleaners.clean_mtext(text)
            spans = [("main", 0, len(text))]
        elif ctype in (sniff.MIME_ZIP, sniff.MIME_GZIP, sniff.MIME_7Z,
                       sniff.MIME_COMPRESS, sniff.MIME_LZ4,
                       sniff.MIME_SNAPPY):
            body, meta, spans, warnings, rejected = _extract_archive_turn(
                text, ctype
            )
        else:  # text/plain, application/xml
            # xpacket packets can be embedded in any turn (X8)
            xp = payload_op.scan_xpackets(text)
            spans = [("xpacket", s, e) for s, e in xp]
            body = payload_op._mask_spans(text, xp)
            spans.append(("main", 0, len(text)))
    except Exception as e:  # absolute backstop — record, never throw
        body = ""
        rejected = True
        warnings = [f"exception: {type(e).__name__}"]

    out = _finalize(body)
    if len(out) > MAX_EXTRACTED_CHARS:
        out = out[:MAX_EXTRACTED_CHARS]
        warnings.append("truncated")

    if rejected:
        status = STATUS_REJECTED
    elif warnings:
        status = STATUS_VALID_WARNINGS
    else:
        status = STATUS_VALID

    return {
        "extracted_text": out,
        "title": title,
        "meta": meta,
        "spans": [
            {"kind": k, "start": s, "end": e} for (k, s, e) in sorted(
                spans, key=lambda x: (x[1], x[2], x[0])
            )
        ],
        "detected_content_type": ctype,
        "parse_status": status,
        "warnings": warnings,
        "chars_in": chars_in,
        "chars_out": len(out),
        "n_pages": n_pages,
    }
