"""Isolated bench-row adjudication — the frozen methodology's mover
check as a tool (BENCH_NOTES.md records its readings each round).

A suite-level mover is adjudicated only if it BOTH exceeds the
measured 19% identical-code noise band AND reproduces here: each named
row runs in THIS fresh JVM with a warmup pass and best-of-3 timings
(GC nudge between runs), isolated from suite-order heap and
codegen-cache effects. Run unflagged, code-unchanged rows alongside as
CONTROLS: if the controls show the same elevation, the verdict is
host-level shift, not regression (the round-9 adjudication's method).

Usage:
    python tools/adjudicate.py <query_name> [...]     # one JVM per call
    for q in q33_asof_join_last_order cc1_neardup_components; do
        python tools/adjudicate.py $q; done           # fully isolated

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_project_using_telegram_and_aws_spark.plans import all_queries
from data_pipeline_project_using_telegram_and_aws_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown query"}))
            continue
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup: footers + codegen
        runs = []
        for _ in range(3):
            spark._jvm.System.gc()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {"name": name, "best": min(runs), "runs": runs,
                 "sf_dir": sf_dir}
            )
        )


if __name__ == "__main__":
    main()
