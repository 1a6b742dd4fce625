"""Benchmark harness — run headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Headline metric: extraction throughput (turns/sec) over a deterministic
bench-scale transcripts table (generated once, cached under .bench/ — the
north-star workload), plus wall-clock for representative operator queries
from __spark_entry__ at the given sf.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from tika_addons_spark.fixtures import generate_transcripts_spark  # noqa: E402
from tika_addons_spark.operators.extract import extract_turns  # noqa: E402
from tika_addons_spark.plans.pipeline import salted_repartition  # noqa: E402
from tika_addons_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q08_event_transitions",
    "q10_full_outer_align",
    "q21_token_entropy",
    "q23_ann_bruteforce",
    "q31_minhash_lsh",
    "q30_extract_documents",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def transcripts_cache(spark, sf: float) -> str:
    n_convs = max(400, int(400_000 * sf))
    path = os.path.join(REPO, ".bench", f"transcripts_{n_convs}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        generate_transcripts_spark(spark, n_convs, seed=42).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf = _sf_of(sf_dir)
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    tpath = transcripts_cache(spark, sf)
    transcripts = spark.read.parquet(tpath)
    n_turns = transcripts.count()

    timings: dict[str, float] = {}

    # headline: the extraction pipeline (salted repartition + Arrow UDF map).
    # one warm-up pass first — codegen JIT + Python worker pool spin-up
    # otherwise dominates a single cold measurement.
    extracted = extract_turns(salted_repartition(transcripts, cpus * 2))
    extracted.count()
    t0 = time.time()
    out_n = extracted.count()
    t_extract = time.time() - t0
    timings["extract_transcripts"] = round(t_extract, 3)
    assert out_n == n_turns

    qmap = entry.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        qmap[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "bench_turns": n_turns,
                "turns_per_sec": round(n_turns / t_extract, 1),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
