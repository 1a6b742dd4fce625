"""Grouped-map conversation operators (SURVEY.md §2.11: the
``DocMapper.map(List<Metadata>) → List<Metadata>`` contract).

The reference's per-container group map (``tika-eval-solrj/.../DocMapper.java``,
impl ``TikaEvalDocMapper.java:86-127``) receives ALL elements of one container
ordered by position and may rewrite/extend them (container rollups stamped on
every element, per-element stats, N-in/M-out). The Spark surface is
``groupBy(conv_id).applyInPandas`` — a pandas DataFrame per conversation in,
a pandas DataFrame out.

Skew note: a grouped map materializes one whole conversation per call, so the
whale fixture (100× median) is the worst case — bounded here because even an
800-turn conversation is ~1 MB. For truly unbounded groups the salted
pre-split in plans/pipeline.py is the guard (§4.2 item 1); rollups that only
need aggregates should prefer operators/rollup.py (partial aggs, no group
materialization).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def map_conversations(
    df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema
) -> DataFrame:
    """Apply ``fn`` to each conversation, turns ordered by turn_idx
    (deterministic input order, W2 — the reference relies on a TreeMap)."""

    def ordered(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values("turn_idx").reset_index(drop=True))

    return df.groupBy("conv_id").applyInPandas(ordered, schema=schema)


# --- concrete mappers --------------------------------------------------------
def _stamp_container(pdf: pd.DataFrame) -> pd.DataFrame:
    """TikaEvalDocMapper-style: element 0 is the container; stamp container
    id/rollups onto every element (Indexer.java:259-275 addIds +
    TikaEvalDocMapper.java:86-114 rollups)."""
    out = pdf.copy()
    out["container_turn_idx"] = int(pdf["turn_idx"].iloc[0])
    out["position"] = range(len(pdf))
    out["total_turns"] = len(pdf)
    out["conv_chars"] = int(pdf["text"].str.len().fillna(0).sum())
    return out


STAMP_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, container_turn_idx int, position int, total_turns int, "
    "conv_chars long"
)


def stamp_container_fields(df: DataFrame) -> DataFrame:
    """N-in/N-out grouped map: per-turn position + container rollup fields."""
    return map_conversations(df, _stamp_container, STAMP_SCHEMA)


def _drop_consecutive_dups(pdf: pd.DataFrame) -> pd.DataFrame:
    """N-in/M-out grouped map: drop turns whose text equals the previous
    turn's text (retry/echo cleanup — a common transcript-corpus pass)."""
    keep = pdf["text"].ne(pdf["text"].shift(1)) | pdf["text"].isna()
    return pdf[keep.fillna(True)]


def dedupe_consecutive_turns(df: DataFrame) -> DataFrame:
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return map_conversations(df, _drop_consecutive_dups, schema)
