"""Full-query wall-clock stress at a given SF (default sf0.1).

The bench set covers 28 headline queries; this runs EVERY ``queries()``
entry once with a per-query watchdog — the sweep that catches operators
whose plan only collapses at scale (it found q66's O(|group|²) grouped
remap and q73's O(n²) rle fold at 150k rows, both invisible at the
sf0.01 oracle scale).

Usage: python tools/stress_sf.py [sf_dir] [limit_seconds] [q1,q2,...]
"""

from __future__ import annotations

import importlib.util
import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
LIMIT = float(sys.argv[2]) if len(sys.argv) > 2 else 90.0
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None


def main():
    from pyspark.sql import SparkSession

    from polars_ruby_spark.session import configure

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = configure(
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    ).getOrCreate()
    sc = spark.sparkContext

    qs = mod.queries()
    names = ONLY or list(qs)
    times, killed = {}, 0
    for name in names:
        t0 = time.perf_counter()
        done = threading.Event()

        def watchdog():
            if not done.wait(LIMIT):
                sc.cancelAllJobs()

        threading.Thread(target=watchdog, daemon=True).start()
        try:
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - t0, 2)
            times[name] = t
            print(f"{t:8.2f}  {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            t = round(time.perf_counter() - t0, 2)
            times[name] = f"KILLED at {t}s"
            killed += 1
            print(f"  KILLED  {name} after {t}s ({repr(e)[:80]})", flush=True)
        done.set()
    ok = [v for v in times.values() if isinstance(v, float)]
    print(json.dumps({"sf_dir": SF_DIR, "total_sec": round(sum(ok), 1),
                      "n_ok": len(ok), "n_killed": killed}))
    sys.exit(1 if killed else 0)


if __name__ == "__main__":
    main()
