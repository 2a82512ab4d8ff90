"""Per-query isolation bench + plan capture (optimization-round tooling).

NOT part of the frozen driver contract — ``bench.py`` stays the measured
surface. This harness reuses bench.py's exact methodology (same session
settings, same warm-then-noop-write timing, same EAGER handling, same
cache release between queries) so numbers here are comparable to the
driver's per-query detail, but lets a single query be timed or its
``explain("formatted")`` captured without running the whole suite.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py time <query> [<query> ...] [--reps N]
    ... python bench_extra.py plan <query> [<query> ...] --out plans/r06 \
            [--suffix _before]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness; imported, never modified)
import __spark_entry__ as entry_mod  # noqa: E402
from sparkcrawl.operators import release_caches  # noqa: E402
from sparkcrawl.session import get_spark  # noqa: E402


def _session():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"sparkcrawl-bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    return spark, sf_dir


def time_queries(names: list[str], reps: int) -> None:
    spark, sf_dir = _session()
    queries = entry_mod.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            if name in bench.EAGER_QUERIES:
                queries[name](spark, sf_dir)  # warm (untimed)
                t0 = time.perf_counter()
                bench._noop_write(queries[name](spark, sf_dir))
                samples.append(round(time.perf_counter() - t0, 3))
            else:
                df = queries[name](spark, sf_dir)
                df.count()  # warm: plan + scan caches
                t0 = time.perf_counter()
                bench._noop_write(df)
                samples.append(round(time.perf_counter() - t0, 3))
            release_caches()
            spark.catalog.clearCache()
        out[name] = samples
        print(json.dumps({name: samples}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timings": out}))


def dump_plans(names: list[str], out_dir: str, suffix: str) -> None:
    spark, sf_dir = _session()
    queries = entry_mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


def main() -> None:
    args = sys.argv[1:]
    if not args or args[0] not in ("time", "plan"):
        print(__doc__)
        sys.exit(2)
    mode, rest = args[0], args[1:]
    reps, out_dir, suffix, names = 1, "plans/r06", "", []
    i = 0
    while i < len(rest):
        if rest[i] == "--reps":
            reps = int(rest[i + 1]); i += 2
        elif rest[i] == "--out":
            out_dir = rest[i + 1]; i += 2
        elif rest[i] == "--suffix":
            suffix = rest[i + 1]; i += 2
        else:
            names.append(rest[i]); i += 1
    if mode == "time":
        time_queries(names, reps)
    else:
        dump_plans(names, out_dir, suffix)


if __name__ == "__main__":
    main()
