"""Round-6 optimization harness (bench.py is FROZEN — extra measurements
live here, per the optimization-round contract).

Modes:
  python bench_extra.py time q1 q2 ...     # per-query wall, N repeats, collect()
  python bench_extra.py plan q1 q2 ...     # dump explain('formatted') to plans/r06/
  python bench_extra.py noop q1 q2 ...     # time with noop sink (no collect cost)

Env: REPEATS (default 3), PLAN_SUFFIX (default 'before'),
     SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.

Same session + warmup protocol as bench.py so numbers are comparable."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from seronet_data_validator_spark.session import get_spark  # noqa: E402
from seronet_data_validator_spark.sources.staging import stage_conf  # noqa: E402


def _warm(spark):
    from pyspark.sql import functions as F

    spark.range(300_000).select(
        F.expr(
            "size(filter(split(repeat('a b c the of d ', 4), ' '),"
            " t -> t IN ('the','of','x','y','z','w')))"
        ),
        F.expr("aggregate(sequence(1, 8), 0L, (acc, x) -> acc + x)"),
        F.expr("length(regexp_replace(concat('ab', id), '[0-9]', ''))"),
        F.expr("try_to_timestamp(concat('2021-01-0', (id % 9) + 1), 'yyyy-MM-dd')"),
    ).write.format("noop").mode("overwrite").save()
    spark.range(300_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    ).select(
        F.expr("sum(v) over (partition by k order by v rows unbounded preceding)"),
        F.expr("lag(v) over (partition by k order by v)"),
    ).write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("REPEATS", "3"))
    stage_dir = os.environ.get("BENCH_STAGE_DIR", "/tmp/spark_graft_bench_extra")
    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]",
        extra_conf=stage_conf(stage_dir),
    )
    _warm(spark)
    qs = entry_mod.queries()
    if not names:
        names = [n for n in qs if n != "clips_validation"]
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if mode == "plan":
            suffix = os.environ.get("PLAN_SUFFIX", "before")
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, sf_dir)
            with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
            print(f"wrote plans/r06/{name}_{suffix}.txt", flush=True)
            continue
        times = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(json.dumps({name: times}), flush=True)
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
