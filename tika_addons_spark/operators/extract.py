"""The extraction operator: Arrow-batched mapInPandas over transcript turns.

Spark-first design (SURVEY.md §3.1 trace): the logical plan is

    scan(transcripts)                      -- Iceberg/parquet, pruned columns
      → repartition(bucketed conv_id [+salt for whales])
      → sortWithinPartitions(conv_id, turn_idx)   -- deterministic order (W2)
      → mapInPandas(extract_batches)              -- THIS operator
      → sink (+ checkpoint/metrics)

``extract_batches`` is an iterator-of-batches UDF (amortizes per-batch setup,
mirroring the reference's "expensive DocMapper — only use one",
``tika-eval-solrj/.../Indexer.java:144-145``). Inside a batch:

- content sniffing and the plain-text path are **vectorized** pandas str ops
  (no per-row Python) — the majority of turns;
- HTML / PDF-ish / markup-code turns run the pure-Python kernels from
  operators/html.py, operators/payload.py, functions/cleaners.py — the same
  functions the standalone oracle uses, so engine ≡ oracle by construction
  and pytest verifies it stays that way.

Per-record failure isolation: the kernels are total functions; a poison turn
yields ``parse_status='rejected'`` + warnings, never a task failure
(reference taxonomy: ParseStatus.java:21-71, TikaClient.java:45-58).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions import normalize, sniff
from ..oracle import MAX_EXTRACTED_CHARS, extract_one
from ..schema import EXTRACTED_SCHEMA, STATUS_REJECTED, STATUS_VALID, STATUS_VALID_WARNINGS

PASSTHROUGH = ["conv_id", "turn_idx", "role", "ts"]
OUT_COLS = [f.name for f in EXTRACTED_SCHEMA.fields]


def _extract_plain_vectorized(texts: pd.Series) -> pd.DataFrame:
    """Vectorized plain/xml path — must match oracle.extract_one exactly
    (asserted by tests/test_extract_engine.py)."""
    body = (
        texts.fillna("")
        .str.replace("\x00", "", regex=False)
        .str.replace("\t", " ", regex=False)
        .str.replace("\r", " ", regex=False)
    )
    body = body.str.replace(normalize.RE_NEWLINES, "\n", regex=True).str.strip()
    truncated = body.str.len() > MAX_EXTRACTED_CHARS
    body = body.str.slice(0, MAX_EXTRACTED_CHARS)
    empty = texts.isna() | (texts.str.strip().str.len() == 0)

    out = pd.DataFrame(index=texts.index)
    out["extracted_text"] = body.where(~empty, "")
    out["title"] = None
    out["meta"] = [{} for _ in range(len(texts))]
    n = pd.to_numeric(texts.str.len(), errors="coerce").fillna(0).astype("int64")
    out["spans"] = [
        [] if e else [{"kind": "main", "start": 0, "end": int(ln)}]
        for e, ln in zip(empty, n)
    ]
    out["detected_content_type"] = sniff.sniff_series(texts)
    out["warnings"] = [
        ["empty-content"] if e else (["truncated"] if t else [])
        for e, t in zip(empty, truncated)
    ]
    out["parse_status"] = STATUS_VALID
    out.loc[truncated & ~empty, "parse_status"] = STATUS_VALID_WARNINGS
    out.loc[empty, "parse_status"] = STATUS_REJECTED
    out["chars_in"] = n.astype("int32")
    out["chars_out"] = out["extracted_text"].str.len().astype("int32")
    out["n_pages"] = pd.array([None] * len(texts), dtype="Int32")
    return out


def extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extract one Arrow batch. Routes rows by sniffed type."""
    texts = pdf["text"]
    ctype = sniff.sniff_series(texts)
    # rows needing the python kernels: html/pdf/mtext/archive, plus plain
    # rows that embed xpacket packets (span scan) — everything else is
    # vectorized.
    needs_kernel = ctype.isin(
        [sniff.MIME_HTML, sniff.MIME_PDF, sniff.MIME_MTEXT,
         sniff.MIME_ZIP, sniff.MIME_GZIP, sniff.MIME_7Z,
         sniff.MIME_COMPRESS, sniff.MIME_LZ4, sniff.MIME_SNAPPY]
    )
    needs_kernel |= texts.str.contains("<?xpacket begin=", regex=False, na=False)

    parts = []
    if (~needs_kernel).any():
        parts.append(_extract_plain_vectorized(texts[~needs_kernel]))
    if needs_kernel.any():
        kernel_rows = [
            extract_one(None if t is None or t is pd.NA else t)
            for t in texts[needs_kernel]
        ]
        kdf = pd.DataFrame(kernel_rows, index=texts.index[needs_kernel])
        kdf["chars_in"] = kdf["chars_in"].astype("int32")
        kdf["chars_out"] = kdf["chars_out"].astype("int32")
        kdf["n_pages"] = kdf["n_pages"].astype("Int32")
        parts.append(kdf)
    out = pd.concat(parts).loc[texts.index]
    out["n_pages"] = out["n_pages"].astype("Int32")

    for col in PASSTHROUGH:
        if col in pdf.columns:
            out[col] = pdf[col]
        else:
            out[col] = None
    return out[OUT_COLS]


def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield extract_batch(pdf)


def extract_turns(df: DataFrame) -> DataFrame:
    """Declarative entry: transcripts DataFrame → extracted DataFrame.

    Delegates to the Arrow-native hot path (extract_arrow.py, mapInArrow):
    plain/xml turns never materialize Python strings; kernel turns run the
    same oracle.extract_one as the pandas twin below. Byte-identical output
    is asserted by tests/test_extract_engine.py."""
    from .extract_arrow import extract_turns_arrow

    return extract_turns_arrow(df)


def extract_turns_pandas(df: DataFrame) -> DataFrame:
    """The mapInPandas twin (readability/reference variant; also the kernel
    the pure-Python ceiling control in bench/hw_ceiling.py measures)."""
    cols = [c for c in PASSTHROUGH if c in df.columns] + ["text"]
    return df.select(*cols).mapInPandas(extract_batches, schema=EXTRACTED_SCHEMA)


def extract_embedded_turns(df: DataFrame) -> DataFrame:
    """UDTF-shaped X10 on the extraction path: one row per *member* of each
    archive turn (base64 zip/gzip data-URI) — the reference's container →
    ``List<Metadata>`` flatten where every element carries the parent key +
    position (``TikaEvalDocMapper.java:86-127``, ``Indexer.java:259-275``).
    Each member's text runs through its own extraction kernel. Narrow stage,
    no shuffle; corrupt members become status rows, never failures."""
    import base64

    from ..oracle import extract_one as _extract_one
    from . import binarchive

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "conv_id", "turn_idx", "member_idx", "member_name",
            "detected_type", "status", "extracted_text", "chars_out",
        ]
        for pdf in it:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if not isinstance(text, str):
                    continue
                ctype = sniff.sniff_one(text)
                if ctype not in (sniff.MIME_ZIP, sniff.MIME_GZIP, sniff.MIME_7Z,
                                 sniff.MIME_COMPRESS, sniff.MIME_LZ4,
                                 sniff.MIME_SNAPPY):
                    continue
                try:
                    data = base64.b64decode(
                        text.strip().split(",", 1)[1], validate=True
                    )
                except Exception:
                    data = None
                members = (
                    binarchive.unpack_one(str(conv_id), data, max_depth=3)
                    if data is not None
                    else [{"member_idx": -1, "member_name": str(conv_id),
                           "member_text": None,
                           "detected_type": sniff.MIME_EMPTY,
                           "status": "corrupt:b64"}]
                )
                for r in members:
                    if r["status"] == "ok" and r["member_text"] is not None:
                        sub = _extract_one(r["member_text"])
                        etext, chars = sub["extracted_text"], sub["chars_out"]
                    else:
                        etext, chars = None, 0
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "member_idx": r["member_idx"],
                            "member_name": r["member_name"],
                            "detected_type": r["detected_type"],
                            "status": r["status"],
                            "extracted_text": etext,
                            "chars_out": chars,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        batches,
        schema=(
            "conv_id string, turn_idx int, member_idx int, member_name string, "
            "detected_type string, status string, extracted_text string, "
            "chars_out int"
        ),
    )


def extract_pages(df: DataFrame) -> DataFrame:
    """UDTF-shaped operator: one row per *page* of each PDF-ish turn
    (N rows in → M rows out), the flatten-embedded-docs pattern of the
    reference (``Step3Unpacker.java:50-229`` numbered children;
    ``ZipFeatureDumper.java:142-207`` per-entry rows; Renderer page artifacts
    ``tika-rendering-dev/.../Renderer.java:34-38``)."""
    import pandas as pd  # noqa: F811 — explicit for the worker closure

    from ..functions import sniff as sniff_mod
    from ..operators.payload import _join_lines, _mask_spans, scan_xpackets

    def batches(it):
        import re

        page_re = re.compile(r"^%%Page\s+(\d+)\s*$")
        for pdf in it:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if not isinstance(text, str):
                    continue
                if sniff_mod.sniff_one(text) != sniff_mod.MIME_PDF:
                    continue
                masked = _mask_spans(text, scan_xpackets(text))
                magic = masked.find("%PDF-")
                eof = masked.find("%%EOF", magic)
                body = masked[magic : eof if eof >= 0 else len(masked)]
                cur, pages = None, []
                for line in body.split("\n")[1:]:
                    m = page_re.match(line.strip())
                    if m:
                        cur = []
                        pages.append((int(m.group(1)), cur))
                        continue
                    if cur is not None:
                        cur.append(line)
                for page_no, lines in pages:
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "page_no": page_no,
                            "page_text": _join_lines(lines),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "page_no", "page_text"]
            )

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        batches,
        schema="conv_id string, turn_idx int, page_no int, page_text string",
    )
