"""Custom stateful streaming operator: per-conversation running state via
``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.10), but its resume/metrics
behaviors imply exactly this shape at stream scale: per-conversation
accumulated lineage (turns seen, chars seen, rejects) that survives across
micro-batches. State is keyed by conv_id; each micro-batch folds its turns
into the state and emits the updated running summary (output mode `update`).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, chars long, last_turn_idx int"
)
STATE_SCHEMA = "n_turns long, chars long, last_turn_idx int"


def _fold_conversation(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        n, chars, last = state.get
    else:
        n, chars, last = 0, 0, -1
    for pdf in pdfs:
        n += len(pdf)
        chars += int(pdf["text"].str.len().fillna(0).sum())
        if len(pdf):
            last = max(last, int(pdf["turn_idx"].max()))
    state.update((n, chars, last))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n],
            "chars": [chars],
            "last_turn_idx": [last],
        }
    )


DEDUP_OUTPUT_SCHEMA = (
    "digest string, first_conv string, first_turn int, n_seen long"
)
DEDUP_STATE_SCHEMA = "first_conv string, first_turn int, n_seen long"


def _fold_dedup(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        first_conv, first_turn, n_seen = state.get
    else:
        first_conv, first_turn, n_seen = None, None, 0
    for pdf in pdfs:
        n_seen += len(pdf)
        if first_conv is None and len(pdf):
            # deterministic survivor: min (conv_id, turn_idx) within the
            # first batch that sees this digest (row order inside a grouped
            # batch is not stable across partitionings)
            first_conv, first_turn = min(
                (str(c), int(t))
                for c, t in zip(pdf["conv_id"], pdf["turn_idx"])
            )
    state.update((first_conv, first_turn, n_seen))
    yield pd.DataFrame(
        {
            "digest": [key[0]],
            "first_conv": [first_conv],
            "first_turn": [first_turn],
            "n_seen": [n_seen],
        }
    )


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: the reference's seen-set (A15,
    ``GithubScraper.java:171-218``) at stream scale — state keyed by
    sha256(text), remembering the first-seen (conv_id, turn_idx) survivor
    and a running duplicate count, updated every micro-batch.

    This keeps FULL seen history like the reference's in-memory Set (state
    size = #distinct texts); for bounded state under event time, Spark's
    built-in ``dropDuplicatesWithinWatermark`` is the alternative — this
    operator exists for the exact unbounded semantics. Output mode
    ``update``: downstream keeps rows where n_seen grew."""
    from pyspark.sql import functions as F

    keyed = stream.select(
        "conv_id", "turn_idx", F.sha2(F.col(text_col), 256).alias("digest")
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        _fold_dedup,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def conversation_running_state(stream: DataFrame) -> DataFrame:
    """Streaming DataFrame in → running per-conversation summary out.

    Caller attaches a sink with outputMode('update')."""
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fold_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
