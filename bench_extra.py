"""Component-isolation benchmarks (guide §1.4) — NOT the metric of record.

``bench.py`` is frozen for measurement; this file exists so optimization
rounds can attribute wall-clock to pipeline pieces (shuffle vs Python
kernel vs plain-arrow path) and keep before/after evidence per component.
Prints one JSON line. Uses the same cached transcripts table and session
configuration as bench.py.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (reuses transcripts_cache; does not run main)
from tika_addons_spark.operators.extract import (  # noqa: E402
    extract_turns,
    extract_turns_pandas,
)
from tika_addons_spark.plans.pipeline import salted_repartition  # noqa: E402
from tika_addons_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", 4))


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _time(label: str, thunk, warm: int = 1, runs: int = RUNS) -> float:
    for _ in range(warm):
        thunk()
    ts = []
    for _ in range(runs):
        t0 = time.time()
        thunk()
        ts.append(time.time() - t0)
    return round(min(ts), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf = bench._sf_of(sf_dir)
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    sc = spark.sparkContext

    tpath = bench.transcripts_cache(spark, sf)
    transcripts = spark.read.parquet(tpath).persist()
    n_turns = transcripts.count()

    out: dict[str, float] = {}
    reparted = salted_repartition(transcripts, cpus * 2)

    sc.setJobDescription("extract: input materialize only")
    out["input_noop"] = _time("input", lambda: _noop(transcripts))

    sc.setJobDescription("extract: salted repartition only")
    out["repartition_noop"] = _time("repart", lambda: _noop(reparted))

    sc.setJobDescription("extract: kernel without repartition")
    out["extract_no_repart_count"] = _time(
        "extract_norepart", lambda: extract_turns(transcripts).count()
    )

    sc.setJobDescription("extract: full pipeline count (bench headline)")
    out["extract_full_count"] = _time(
        "extract_full", lambda: extract_turns(reparted).count()
    )

    sc.setJobDescription("extract: full pipeline noop (all columns)")
    out["extract_full_noop"] = _time(
        "extract_full_noop", lambda: _noop(extract_turns(reparted))
    )

    sc.setJobDescription("extract: pandas twin (reference variant)")
    out["extract_pandas_count"] = _time(
        "extract_pandas", lambda: extract_turns_pandas(reparted).count(), runs=2
    )

    sc.setJobDescription(None)
    print(
        json.dumps(
            {
                "metric": "component_isolation_sec",
                "sf": sf,
                "cpus": cpus,
                "n_turns": n_turns,
                "components": out,
                "loadavg_1min": round(os.getloadavg()[0], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
