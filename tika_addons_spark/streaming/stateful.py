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


NEARDUP_OUTPUT_SCHEMA = (
    "id_a string, id_b string, band int, bucket string, est_jaccard double"
)
# per-bucket memory: member ids + their signatures (packed int64 bytes for
# compact state rows) + the hot-bucket saturation latch
NEARDUP_STATE_SCHEMA = "ids array<string>, sig_bytes binary, saturated boolean"


def _make_fold_neardup(n_hashes: int, threshold: float, max_bucket_size: int):
    import numpy as np

    def fold(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, sig_bytes, saturated = state.get
            ids = list(ids)
            mat = np.frombuffer(sig_bytes, dtype=np.int64).reshape(-1, n_hashes)
        else:
            ids, saturated = [], False
            mat = np.empty((0, n_hashes), dtype=np.int64)
        out_a, out_b, out_e = [], [], []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["id"], pdf["signature"]):
                if saturated:
                    break
                if len(ids) >= max_bucket_size:
                    # hot bucket: same contract as the batch operator's
                    # max_bucket_size — stop pairing AND stop growing state
                    # (mega-families belong to exact dedup / clustering)
                    saturated = True
                    break
                s = np.asarray(sig, dtype=np.int64)
                if len(ids):
                    est = (mat == s[None, :]).mean(axis=1)
                    hit = np.nonzero(est >= threshold)[0]
                    for j in hit:
                        a, b = sorted((str(ids[j]), str(doc_id)))
                        out_a.append(a)
                        out_b.append(b)
                        out_e.append(round(float(est[j]), 4))
                ids.append(str(doc_id))
                mat = np.vstack([mat, s[None, :]])
        state.update((ids, mat.tobytes(), saturated))
        yield pd.DataFrame(
            {
                "id_a": out_a,
                "id_b": out_b,
                "band": int(key[0]),
                "bucket": str(key[1]),
                "est_jaccard": out_e,
            }
        )

    return fold


def streaming_minhash_neardup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    n_bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int = 64,
    shingle_k: int = 5,
    unit: str = "token",
    seed: int = 42,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup: every incoming document is paired
    against ALL previously-seen documents sharing an LSH bucket — the
    crawl-time "is this page a near-dup of anything we already have" shape
    that the batch operators (q31/q41) answer only per-snapshot.

    Plan shape per micro-batch: stateless vectorized signature UDF →
    banding (posexplode + hash, JVM-side) → ``applyInPandasWithState``
    keyed by (band, bucket), state = the bucket's member ids + packed
    signatures. Shuffle is ∝ band rows, state is ∝ corpus × n_bands and
    per-bucket capped: a bucket that reaches ``max_bucket_size`` saturates
    (stops pairing AND stops growing — the hot-bucket contract of the
    batch path, where boilerplate mega-families belong to exact dedup).

    A pair colliding in k bands is emitted k times (per-bucket state has
    no cross-bucket view); attach the sink with
    :func:`write_neardup_stream`, which folds the per-micro-batch
    ``dropDuplicates(["id_a","id_b"])`` into the operator's contract so
    callers see the batch path's ``.distinct()`` semantics. Raw band-level
    rows (with their ``band`` column showing multiplicity) are only for
    callers that deliberately bypass the wrapper."""
    from pyspark.sql import functions as F

    from ..operators.dedup import _banded, minhash_signatures

    sigs = minhash_signatures(
        stream.select(F.col(id_col).cast("string").alias("id"), text_col),
        "id", text_col, n_hashes=n_hashes, shingle_k=shingle_k,
        seed=seed, unit=unit,
    )
    banded = _banded(sigs, n_bands, rows_per_band, carry=("signature",))
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_fold_neardup(n_hashes, threshold, max_bucket_size),
        outputStructType=NEARDUP_OUTPUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_neardup_stream(pairs: DataFrame, sink):
    """Attach a sink to :func:`streaming_minhash_neardup` output with the
    batch path's pair semantics: each micro-batch is reduced to distinct
    (id_a, id_b) pairs (a pair colliding in k bands would otherwise land
    k times — the r4-flagged contract mismatch vs the batch
    ``.distinct()``). ``sink(batch_df, batch_id)`` receives the deduped
    micro-batch; returns the DataStreamWriter (caller adds trigger/start).
    """

    def fold_batch(batch_df, batch_id: int) -> None:
        sink(
            batch_df.dropDuplicates(["id_a", "id_b"]).drop("band", "bucket"),
            batch_id,
        )

    return pairs.writeStream.foreachBatch(fold_batch)


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
