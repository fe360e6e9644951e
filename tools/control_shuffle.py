"""Engine-free scaling CONTROL: a textbook Spark aggregation (range →
sha256 project → groupBy(1M keys) with max_by + count), no engine code,
run at two parallelism levels. Its N -> 4N efficiency measures what THIS
HOST allows any Spark workload, which calibrates the engine ladder in
`BENCH/BASELINE.md`: engine-relative efficiency = engine_eff /
control_eff. cgroup CPU accounting is printed alongside walls.

    PYTHONPATH=/root/repo python tools/control_shuffle.py [--masters local[4] local[16]] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def cg_ns() -> int:
    for p in ("/sys/fs/cgroup/cpu.stat", "/sys/fs/cgroup/cpuacct/cpuacct.usage"):
        try:
            s = open(p).read()
            if "usage_usec" in s:
                return int(s.split("usage_usec")[1].split()[0]) * 1000
            return int(s)
        except (OSError, ValueError, IndexError):
            continue
    return 0


def run_master(master: str, trials: int) -> dict:
    os.environ.setdefault("SPARK_HOME", os.path.dirname(__import__("pyspark").__file__))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    local_dir = f"/dev/shm/ctrl-{os.getpid()}"
    b = (
        SparkSession.builder.master(master)
        .appName("scaling-control")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.local.dir", local_dir)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(50_000_000, numPartitions=64).select(
        (F.col("id") % 1_000_000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
    )

    def once() -> float:
        t0 = time.time()
        df.groupBy("k").agg(F.max_by("v", "k"), F.count(F.lit(1))).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0

    once()  # JIT warmup excluded
    runs = []
    for _ in range(trials):
        u0, t0 = cg_ns(), time.time()
        w = once()
        runs.append(
            {"wall_sec": round(w, 1), "busy_cores": round((cg_ns() - u0) / 1e9 / w, 1)}
        )
        print(f"  {master}: {runs[-1]}", file=sys.stderr)
    spark.stop()
    import shutil

    shutil.rmtree(local_dir, ignore_errors=True)
    return {"master": master, "runs": runs, "best_wall": min(r["wall_sec"] for r in runs)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--masters", nargs="+", default=["local[4]", "local[16]"])
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()
    out = [run_master(m, args.trials) for m in args.masters]
    res = {"control": out}
    if len(out) == 2:
        import re

        def cores(m):
            return int(re.search(r"\d+", m["master"]).group())

        lo, hi = sorted(out, key=cores)
        res["efficiency"] = round(
            (lo["best_wall"] / hi["best_wall"]) / (cores(hi) / cores(lo)), 3
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
