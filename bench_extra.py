"""Round-7 optimization harness — isolated per-query timings and plan
capture.  NOT the driver bench (bench.py is frozen); this file exists
so individual queries can be measured (guide §1.4: noop-sink isolation,
min-of-N with a cold pass) and their `.explain("formatted")` output
committed to plans/r07/.

Usage:
  python bench_extra.py time  <query> [query ...]   # min-of-N collect()
  python bench_extra.py noop  <query> [query ...]   # noop-sink write
  python bench_extra.py plans <suffix> <query> ...  # plans/r07/<q>_<suffix>.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _spark():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from honas_spark.session import get_spark

    spark = get_spark(app="bench_extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main():
    mode = sys.argv[1]
    if mode == "plans":
        suffix, names = sys.argv[2], sys.argv[3:]
    else:
        suffix, names = None, sys.argv[2:]

    import __spark_entry__ as E

    spark = _spark()
    qs = E.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        if mode == "plans":
            os.makedirs("plans/r07", exist_ok=True)
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r07/{name}_{suffix}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print("wrote", path)
            continue
        samples = []
        for _ in range(REPS):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(name, samples, "min", min(samples), flush=True)
    if out:
        print(json.dumps({"sf": SF_DIR, "mode": mode, "samples": out}))
    spark.stop()


if __name__ == "__main__":
    main()
