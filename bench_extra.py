#!/usr/bin/env python
"""Round-7 measurement harness (bench.py is FROZEN — this file holds
the extra instrumentation the optimization round needs: noop-sink
isolation per guide §1.4, plan capture, per-query repeat timing).

Usage:
  python bench_extra.py time <query> [query...]   # cold + 3 warm, noop sink
  python bench_extra.py plan <query> [query...]   # write plans/r07/<q>_*.txt
  python bench_extra.py suite                     # every query, 1 cold + 2 warm

Timings use the same session shape as bench.py (get_spark, local[32],
ERROR log level) and the same `.count()` action as the frozen bench so
numbers are comparable; `noop` mode materializes every column instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session():
    from lacspark.spark.session import get_spark

    spark = get_spark(app_name="lacspark-bench-extra", cores=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_query(spark, name, n_warm=3, action="count"):
    from lacspark.queries import SPARK_QUERIES

    fn = SPARK_QUERIES[name]

    def run():
        df = fn(spark, SF_DIR)
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
            return None
        return df.count()

    spark.sparkContext.setJobDescription(f"bench_extra:{name}")
    t0 = time.time(); n = run(); cold = time.time() - t0
    warm = []
    for _ in range(n_warm):
        t0 = time.time(); run(); warm.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return {"name": name, "rows": n, "cold": round(cold, 3), "warm": warm,
            "best": min(warm), "first_warm": warm[0]}


def plan_query(spark, name, tag):
    from lacspark.queries import SPARK_QUERIES

    os.makedirs("plans/r07", exist_ok=True)
    df = SPARK_QUERIES[name](spark, SF_DIR)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    path = f"plans/r07/{name}_{tag}.txt"
    with open(path, "w") as fh:
        fh.write(txt)
    return path


def main():
    cmd = sys.argv[1]
    spark = get_session()
    if cmd == "time":
        for q in sys.argv[2:]:
            print(json.dumps(time_query(spark, q)))
    elif cmd == "noop":
        for q in sys.argv[2:]:
            print(json.dumps(time_query(spark, q, action="noop")))
    elif cmd == "plan":
        tag = os.environ.get("PLAN_TAG", "before")
        for q in sys.argv[2:]:
            print(plan_query(spark, q, tag))
    elif cmd == "suite":
        from lacspark.queries import SPARK_QUERIES
        total = 0.0
        for q in SPARK_QUERIES:
            r = time_query(spark, q, n_warm=2)
            total += r["first_warm"]
            print(json.dumps(r), flush=True)
        print(json.dumps({"total_first_warm": round(total, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
