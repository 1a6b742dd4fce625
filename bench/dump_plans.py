"""Dump .explain('formatted') for bench queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python bench/dump_plans.py <suffix> [query ...]
Plan-only (no jobs executed) except queries whose builders themselves run
eager actions (persist/count inside the builder, e.g. q31/q42) — those
still execute their eager prefix.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from tika_addons_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q01_pricing_summary", "q08_event_transitions", "q10_full_outer_align",
    "q21_token_entropy", "q23_ann_bruteforce", "q30_extract_documents",
    "q47_binary_archive_rollup", "q48_lang_grid", "q52_sevenz_rollup",
    "q56_decoded_pixel_sum", "q59_extract_planted", "q60_langid_planted",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    qmap = entry.queries()
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
