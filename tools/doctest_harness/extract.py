"""Extract YARD ``@example`` blocks from the reference's Ruby sources.

The reference's own doctest oracle is ``test/docs_test.rb:161-207``: for every
public method it concatenates the method's ``@example`` blocks (variables from
earlier examples stay in scope), evaluates them, and string-compares the
rendered output against the trailing ``# =>`` comment.  This module reproduces
the *extraction* half: it walks ``/root/reference/lib/polars/**/*.rb`` and
yields one record per example block with the Ruby code lines, the expected
output (inline scalar or rendered block), and the owning method.

Reference layout (``lib/polars/expr.rb`` etc.)::

    # Some docstring.
    #
    # @example
    #   df = Polars::DataFrame.new({"a" => [1, 2]})
    #   df.select(Polars.col("a").sum)
    #   # =>
    #   # shape: (1, 1)
    #   # ...table...
    def sum
      ...

Output record fields:
  file, line      -- provenance (reference-relative path, 1-based line)
  cls             -- class name guessed from the file name (ArrayExpr, ...)
  method          -- the ``def`` name that follows the doc block
  example_index   -- 0-based index of this example within the method
  code            -- list[str] Ruby code lines (comment prefix stripped)
  expected_inline -- str | None  (text after ``# => `` on one line)
  expected_block  -- list[str] | None (lines after a bare ``# =>``)
"""

import json
import os
import re
import sys

REF_LIB = "/root/reference/lib/polars"


def _class_from_filename(fname: str) -> str:
    stem = os.path.basename(fname)[:-3]
    return "".join(p.capitalize() for p in stem.split("_"))


_DEF_RE = re.compile(r"^\s*def\s+(self\.)?([A-Za-z_][A-Za-z0-9_]*[?!=]?)")
_COMMENT_RE = re.compile(r"^(\s*)#( (.*))?$")
_TAG_RE = re.compile(r"^@(\w+)")


def extract_file(path: str):
    """Yield example records from one .rb file."""
    with open(path, "r", encoding="utf-8") as f:
        lines = f.readlines()

    records = []
    pending = []  # examples waiting for their `def`
    i = 0
    n = len(lines)
    while i < n:
        m = _COMMENT_RE.match(lines[i].rstrip("\n"))
        if not m or (m.group(3) or "").split(" ")[0] != "@example":
            if pending and _DEF_RE.match(lines[i]):
                dm = _DEF_RE.match(lines[i])
                for idx, rec in enumerate(pending):
                    rec["method"] = dm.group(2)
                    rec["example_index"] = idx
                    records.append(rec)
                pending = []
            elif pending and lines[i].strip() and not lines[i].lstrip().startswith("#"):
                # non-def code line (attr/alias/etc.) -- attach to it anyway
                tok = lines[i].strip().split(" ")[0]
                for idx, rec in enumerate(pending):
                    rec["method"] = tok
                    rec["example_index"] = idx
                    records.append(rec)
                pending = []
            i += 1
            continue

        start_line = i + 1  # 1-based
        indent = m.group(1)
        body = []  # raw example text lines (after "#   " strip)
        i += 1
        while i < n:
            cm = _COMMENT_RE.match(lines[i].rstrip("\n"))
            if not cm or cm.group(1) != indent:
                break
            content = cm.group(3)
            if content is None:
                # bare "#" -- blank line inside the doc comment: the example
                # text continues only if the next line is still indented code
                nxt = _COMMENT_RE.match(lines[i + 1].rstrip("\n")) if i + 1 < n else None
                if nxt and nxt.group(3) and nxt.group(3).startswith("  "):
                    body.append("")
                    i += 1
                    continue
                break
            if _TAG_RE.match(content):
                break
            if content.startswith("  "):
                body.append(content[2:])
                i += 1
            else:
                break

        code, expected_inline, expected_block = _split_body(body)
        pending.append(
            {
                "file": os.path.relpath(path, os.path.dirname(REF_LIB)),
                "line": start_line,
                "cls": _class_from_filename(path),
                "method": None,
                "code": code,
                "expected_inline": expected_inline,
                "expected_block": expected_block,
            }
        )
    return records


def _split_body(body):
    """Split example text into code lines and the trailing expected output.

    Two forms (docs_test.rb:192-203): a final line ``# => <inline>``, or a
    ``# =>`` sentinel followed by ``# <rendered line>`` rows.  Intermediate
    ``# =>`` outputs (multi-statement examples) are dropped -- only the last
    one is compared, matching the reference harness.
    """
    code = []
    expected_inline = None
    expected_block = None
    i = 0
    n = len(body)
    while i < n:
        ln = body[i]
        if ln.startswith("# => "):
            expected_inline, expected_block = ln[5:], None
            i += 1
        elif ln.strip() == "# =>":
            blk = []
            i += 1
            while i < n and body[i].startswith("# "):
                blk.append(body[i][2:])
                i += 1
            while i < n and body[i].strip() == "":
                i += 1
            expected_inline, expected_block = None, blk
        else:
            if ln.startswith("# ") or ln.strip() == "#":
                # stray comment inside code (rare) -- keep as python comment later
                code.append(ln)
            else:
                code.append(ln)
                expected_inline = expected_block = None  # output must trail code
            i += 1
    return code, expected_inline, expected_block


def extract_all(lib_dir: str = REF_LIB):
    records = []
    for fname in sorted(os.listdir(lib_dir)):
        if fname.endswith(".rb"):
            records.extend(extract_file(os.path.join(lib_dir, fname)))
    for rec in records:
        rec["id"] = f"{rec['cls']}.{rec['method']}[{rec['example_index']}]"
    return records


if __name__ == "__main__":
    recs = extract_all()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/doctest_corpus.json"
    with open(out, "w") as f:
        json.dump(recs, f, indent=1)
    n_inline = sum(1 for r in recs if r["expected_inline"] is not None)
    n_block = sum(1 for r in recs if r["expected_block"] is not None)
    n_none = sum(
        1 for r in recs if r["expected_inline"] is None and r["expected_block"] is None
    )
    print(
        f"{len(recs)} examples from {len({r['file'] for r in recs})} files -> {out}\n"
        f"inline={n_inline} block={n_block} no-expected={n_none} "
        f"methods={len({(r['cls'], r['method']) for r in recs})}"
    )
