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
