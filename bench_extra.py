#!/usr/bin/env python
"""Extra measurement harness for the optimization round (guide §1).

NOT the frozen driver bench (bench.py). This one:
- times individual contract queries with the noop sink (§1.4) so the
  computation is measured, not the count()-pruned subtree;
- labels jobs (§1.5);
- dumps .explain('formatted') per query to plans/r06/<name>_<tag>.txt.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [--tag before] [--reps 3] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    tag, reps, noop = "before", 3, True
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--reps":
            reps = int(next(it))
        elif a == "--count":  # time .count() like the frozen bench does
            noop = False
        else:
            args.append(a)

    from geospatial_cuda_spark.session import get_spark

    spark = get_spark(
        "bench_extra", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = dict(E.queries())
    names = args or list(qs)
    os.makedirs("plans/r06", exist_ok=True)

    results: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        # plan dump (lazy frame; snapshot queries execute side effects here)
        try:
            df = fn(spark, SF_DIR)
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        except Exception as ex:  # pragma: no cover
            print(f"# {name}: explain failed: {ex}", file=sys.stderr)
        ts: list[float] = []
        for i in range(reps + 1):  # rep 0 = untimed warmup
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            out = fn(spark, SF_DIR)
            if noop:
                out.write.format("noop").mode("overwrite").save()
            else:
                out.count()
            dt = round(time.time() - t0, 3)
            if i > 0:
                ts.append(dt)
        spark.sparkContext.setJobDescription(None)
        results[name] = ts
        print(json.dumps({"query": name, "best": min(ts, default=None), "reps": ts}),
              flush=True)
    print(json.dumps({"tag": tag, "sf": os.path.basename(SF_DIR.rstrip('/')),
                      "best": {n: min(t, default=None) for n, t in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
