"""Full-query wall-clock stress at a given SF (default sf0.1).

The bench set covers 28 headline queries; this runs EVERY ``queries()``
entry once with a per-query watchdog — the sweep that catches operators
whose plan only collapses at scale (it found q66's O(|group|²) grouped
remap and q73's O(n²) rle fold at 150k rows, both invisible at the
sf0.01 oracle scale).

With ``--skew`` (round-5, VERDICT r4 item 6) the tool first builds a
synthetic HOT-KEY variant of the SF dir — one user owns 50% of events
(grouped windows / asof / session families all hash on user_id) and one
document text is duplicated into 50% of documents (one exact-dup group,
one saturated MinHash/SimHash LSH bucket at the pair cap) — then runs the
window/group/dedup query families against it under the same watchdog.
Green = every query completes within the limit despite the hot key.

Usage: python tools/stress_sf.py [sf_dir] [limit_seconds] [q1,q2,...] [--skew]
"""

from __future__ import annotations

import importlib.util
import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

_args = [a for a in sys.argv[1:] if a != "--skew"]
SKEW = "--skew" in sys.argv[1:]
SF_DIR = _args[0] if len(_args) > 0 else "/root/testdata/sf0.1"
LIMIT = float(_args[1]) if len(_args) > 1 else 90.0
ONLY = _args[2].split(",") if len(_args) > 2 else None

#: window/group/dedup families that hash on the skewed keys
SKEW_SET = [
    "q10_join_asof", "q12_lag_diff", "q13_cum_sum", "q14_rolling_1h",
    "q15_dynamic_1h", "q52_dynamic_sliding", "q55_session_windows",
    "q134_calendar_rolling", "q143_rolling_spearman",
    "q40_dedup_exact", "q41_minhash_pairs", "q42_ngram_jaccard",
    "q49_simhash", "q80_dedup_clusters", "q68_topk_salted",
    "q147_distinct_flags_agg",  # giant-group gate (one hot customer)
]


def make_skew_dir(sf_dir: str) -> str:
    """Materialize the hot-key variant: arrow-level rewrite of events
    (even event_ids -> user_id 1) and documents (even doc_ids -> one
    shared text); every other table symlinks through."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="plsq_skew_")
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    hot = pc.equal(pc.bit_wise_and(ev["event_id"], 1), 0)
    ui = ev.schema.get_field_index("user_id")
    ev = ev.set_column(ui, "user_id", pc.if_else(
        hot, pa.scalar(1, ev.schema.field("user_id").type), ev["user_id"]))
    pq.write_table(ev, os.path.join(out, "events.parquet"))

    dc = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    hot_text = dc["text"][0].as_py() or "hot duplicate document text body"
    hd = pc.equal(pc.bit_wise_and(dc["doc_id"], 1), 0)
    ti = dc.schema.get_field_index("text")
    dc = dc.set_column(ti, "text", pc.if_else(
        hd, pa.scalar(hot_text, dc.schema.field("text").type), dc["text"]))
    pq.write_table(dc, os.path.join(out, "documents.parquet"))

    # one customer owns 50% of orders (giant-group gate: q147's composed
    # full-array flag routes must reroute to staged windows, round-6)
    od = pq.read_table(os.path.join(sf_dir, "orders.parquet"))
    ho = pc.equal(pc.bit_wise_and(od["o_orderkey"], 1), 0)
    ci = od.schema.get_field_index("o_custkey")
    od = od.set_column(ci, "o_custkey", pc.if_else(
        ho, pa.scalar(1, od.schema.field("o_custkey").type),
        od["o_custkey"]))
    pq.write_table(od, os.path.join(out, "orders.parquet"))

    for f in os.listdir(sf_dir):
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf_dir, f), dst)
    return out


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
    global SF_DIR
    if SKEW:
        SF_DIR = make_skew_dir(SF_DIR)
        print(f"skew variant at {SF_DIR}", flush=True)
        names = ONLY or [n for n in SKEW_SET if n in qs]
    else:
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
    print(json.dumps({"sf_dir": SF_DIR, "skew": SKEW,
                      "total_sec": round(sum(ok), 1),
                      "n_ok": len(ok), "n_killed": killed}))
    sys.exit(1 if killed else 0)


if __name__ == "__main__":
    main()
