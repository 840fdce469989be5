"""Partition-count invariance sweep: every ``queries()`` entry must produce
the SAME canonical result under different ``spark.sql.shuffle.partitions``
(and therefore under different cluster widths).

This is the 100 TB axis the DuckDB oracle can't see: an operator whose
output depends on partition layout (undeclared order-dependence, first/last
without a key, partition-local RNG) passes a single-config oracle run but
drifts when the executor count changes.  Seeded ops here are seed-stable BY
CONSTRUCTION (md5 of row identity, not partition-local RNG), so they must
pass too — no skip-list.

Usage: python tools/determinism_check.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_correctness import table_hash  # noqa: E402  (same canonicalizer)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
# (shuffle partitions, giant-group route override, min stream stage files):
# the second config simultaneously narrows the cluster width, forces the
# ARRAY agg route (default is the staged reroute — both must be
# bit-identical) and widens the streaming replays' micro-batch count
# (round-7; the three axes are all "cluster shape" knobs results must not
# see, so divergence on any of them fails the sweep)
CONFIGS = ((32, None, None), (5, "0", "3"))


def run_config(cfg, names):
    import os

    nparts, force, stream_files = cfg
    for var, val in (("SPARK_GRAFT_GIANT_GROUP_FORCE", force),
                     ("SPARK_GRAFT_STREAM_FILES", stream_files)):
        if val is None:
            os.environ.pop(var, None)
        else:
            os.environ[var] = val
    return _run_config_inner(nparts, names)


def _run_config_inner(nparts, names):
    import importlib.util

    from pyspark.sql import SparkSession

    from polars_ruby_spark.session import configure

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = configure(
        SparkSession.builder.master("local[*]")
        .appName(f"determinism-{nparts}")
        .config("spark.sql.shuffle.partitions", str(nparts))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    ).getOrCreate()
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))

    out = {}
    qs = mod.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            rows = df.collect()
            cols = df.columns
            out[name] = (len(rows), table_hash(cols, [tuple(r) for r in rows]))
        except Exception as e:  # noqa: BLE001
            out[name] = ("ERROR", repr(e)[:200])
    spark.stop()
    return out


def main():
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = [n for n in mod.queries() if ONLY is None or n in ONLY]

    results = [run_config(cfg, names) for cfg in CONFIGS]
    bad = 0
    for n in names:
        vals = [r[n] for r in results]
        if len(set(vals)) == 1 and vals[0][0] != "ERROR":
            print(f"✓ {n}", flush=True)
        else:
            bad += 1
            print(f"✗ {n}: " + " vs ".join(
                f"cfg={c}:{v}" for c, v in zip(CONFIGS, vals)), flush=True)
    print(f"\n{len(names) - bad} invariant, {bad} partition-dependent")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
