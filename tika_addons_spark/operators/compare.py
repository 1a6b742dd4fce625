"""Multi-run comparison harness (SURVEY.md §2.3 J1/J3, §3.4).

Re-expresses ``eval-addons/.../MultiComparer.java`` Spark-first:

- J1: N extraction outputs full-outer aligned on ``(conv_id, turn_idx)``;
  a run missing a key contributes sentinel ``-1`` metrics
  (``MultiComparer.java:193-199``).
- J3: "sim sets" — runs whose outputs are token-bag-identical per key get
  the same set label, labels assigned in first-seen order
  (``MultiComparer.java:110-148``) → canonicalized-bag digest + dense_rank.
- The fixture-equality gate: expected ↔ actual align with zero tolerated
  mismatches (our tier-2 correctness gate per BASELINE.md).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.stats import tokens_col

KEY = ["conv_id", "turn_idx"]


def align_runs(runs: dict[str, DataFrame], metrics: list[str]) -> DataFrame:
    """J1 — full-outer align N runs on the turn key.

    Returns one row per key with ``<metric>_<run>`` columns; missing rows →
    -1 sentinels. At scale each input is bucketed on conv_id so the join
    co-partitions; AQE handles residual skew."""
    prepared = []
    for name, df in runs.items():
        sel = df.select(
            *KEY, *[F.col(m).alias(f"{m}_{name}") for m in metrics]
        )
        prepared.append(sel)
    joined = reduce(lambda a, b: a.join(b, KEY, "full_outer"), prepared)
    fills = {
        f"{m}_{name}": -1 for name in runs for m in metrics
    }
    return joined.fillna(fills)


def sim_sets(runs: dict[str, DataFrame], text_col: str = "extracted_text") -> DataFrame:
    """J3 — group runs by exact token-bag equality per key.

    bag digest = sha256 over the sorted token multiset (canonicalization ≡
    the reference's Map equality on bag-of-words, MultiComparer.java:135-148);
    set ids are ``set_0, set_1, ...`` in first-seen (run-name) order per key.
    """
    bags = []
    for name, df in runs.items():
        bags.append(
            df.select(
                *KEY,
                F.lit(name).alias("run"),
                F.sha2(
                    F.concat_ws(
                        " ", F.array_sort(tokens_col(text_col))
                    ),
                    256,
                ).alias("bag_digest"),
            )
        )
    all_bags = reduce(lambda a, b: a.unionByName(b), bags)
    w = Window.partitionBy(*KEY).orderBy("first_run")
    firsts = all_bags.groupBy(*KEY, "bag_digest").agg(
        F.min("run").alias("first_run"), F.collect_set("run").alias("runs")
    )
    return firsts.withColumn(
        "sim_set", F.concat(F.lit("set_"), F.dense_rank().over(w) - 1)
    )


def equality_gate(
    actual: DataFrame, expected: DataFrame, cols: list[str]
) -> DataFrame:
    """The tier-2 gate: full-outer align and return ONLY mismatching rows
    (empty result == pass). NULL-safe comparison via <=> (IS NOT DISTINCT
    FROM), missing side counts as mismatch."""
    a = actual.select(*KEY, *[F.col(c).alias(f"a_{c}") for c in cols])
    e = expected.select(*KEY, *[F.col(c).alias(f"e_{c}") for c in cols])
    j = a.join(e, KEY, "full_outer")
    cond = reduce(
        lambda x, y: x | y,
        [~F.col(f"a_{c}").eqNullSafe(F.col(f"e_{c}")) for c in cols],
    )
    return j.filter(cond).orderBy(*KEY)
