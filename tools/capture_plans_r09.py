"""Capture .explain("formatted") for headline queries into plans/r09/.

Usage: python tools/capture_plans_r09.py before|after [query ...]
Defaults to every headline query in bench.py. Output:
plans/r09/<query>_<tag>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "tag must be before|after"
    names = sys.argv[2:]

    from ftm_columnstore_spark.session import get_spark

    import __spark_entry__ as entry_mod
    import bench

    qs = entry_mod.queries()
    if not names:
        names = list(bench.HEADLINE)

    spark = get_spark(
        "ftmcs-plans-r09",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        # release anything the operator persisted during build
        for cached in getattr(df, "_cached_intermediates", []) or []:
            try:
                cached.unpersist()
            except Exception:
                pass
        spark.catalog.clearCache()
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
