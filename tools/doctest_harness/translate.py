"""Mechanical Ruby -> Python translation for the reference's @example code.

Scope: the common subset the polars-ruby docs actually use (see
``/root/reference/test/docs_test.rb`` for the reference's own harness).
Anything outside it raises ``TranslateError`` with a reason string that the
runner records in the skip ledger -- we prefer an honest skip over a wrong
translation silently passing.

The translation is a string-aware character scan, not a Ruby parser: the doc
examples are a narrow dialect (constructor + method chains + literals), and a
scanner that tracks string/bracket state covers it.
"""

import re

RUBY_KEYWORDS_UNSUPPORTED = (
    "do |",
    " do\n",
    "lambda do",
    "begin",
    "rescue",
    "#{",
    "while ",
    ".each ",
    ".each(",
    ".each.",
    ".times",
    "puts ",
    "instance_eval",
)


class TranslateError(Exception):
    def __init__(self, reason):
        super().__init__(reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# logical-line assembly


def join_logical(lines):
    """Merge physical lines into logical Ruby statements.

    Continuation rules used by the docs: open brackets, a trailing operator
    or comma, or a following line that starts with ``.`` / ``)`` / ``]`` /
    ``}``.
    """
    out = []
    buf = ""
    depth = 0
    for raw in lines:
        ln = raw.rstrip()
        if not ln.strip():
            if not buf:
                continue
        if buf:
            buf += "\n" + ln
        else:
            buf = ln
        depth = _bracket_depth(buf)
        if depth > 0:
            continue
        stripped = buf.rstrip()
        if stripped.endswith((",", "+", "-", "*", "/", "&&", "||", "=", "<", ">", ".")):
            continue
        out.append(buf)
        buf = ""
    if buf.strip():
        if _bracket_depth(buf) != 0:
            raise TranslateError("unbalanced brackets in example code")
        out.append(buf)
    # re-merge: a statement starting with '.' continues the previous one
    merged = []
    for st in out:
        if st.lstrip().startswith(".") and merged:
            merged[-1] += "\n" + st
        else:
            merged.append(st)
    return merged


def _bracket_depth(s):
    depth = 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in "\"'":
            i = _skip_string(s, i)
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        i += 1
    return depth


def _skip_string(s, i):
    """Return index just past the string literal starting at s[i]."""
    q = s[i]
    i += 1
    while i < len(s):
        if s[i] == "\\":
            i += 2
            continue
        if s[i] == q:
            return i + 1
        i += 1
    return i


# ---------------------------------------------------------------------------
# statement translation

_WORD_MAP = {"nil": "None", "true": "True", "false": "False"}

_CTOR_RE = re.compile(r"Polars::([A-Za-z_][A-Za-z0-9_]*)\.new\b")
_CONST_RE = re.compile(r"Polars::([A-Za-z_][A-Za-z0-9_]*)")
_MODULE_RE = re.compile(r"Polars\.")
_DATE_RE = re.compile(r"\bDate\.new\(")
_DATETIME_RE = re.compile(r"\bDateTime\.new\(")
_TIME_UTC_RE = re.compile(r"\bTime\.utc\(")
_BIGDEC_RE = re.compile(r"\bBigDecimal\(")
_FLOAT_NAN_RE = re.compile(r"\bFloat::NAN\b")
_FLOAT_INF_RE = re.compile(r"\bFloat::INFINITY\b")
_LAMBDA_ARROW_RE = re.compile(r"->\(([^)]*)\)\s*\{\s*(.*?)\s*\}", re.S)
_BLOCK_RE = re.compile(r"\{\s*\|([^|]*)\|\s*(.*?)\s*\}", re.S)
_RANGE_RE = re.compile(r"\(?(-?\d[\d_]*)\s*(\.\.\.?)\s*(-?\d[\d_]*)\)?")


def translate_statement(stmt, property_names, module_nocall):
    for kw in RUBY_KEYWORDS_UNSUPPORTED:
        if kw in stmt:
            raise TranslateError(f"unsupported construct: {kw.strip()!r}")
    if re.search(r"\bdo\s*$", stmt.split("\n")[0]) or re.search(
        r"\)\s*do\b", stmt
    ):
        # Config/StringCache `X do ... end` blocks: rendering-config scopes
        raise TranslateError("ruby do...end block")
    stmt = stmt.replace("._hash", ".hash")  # Ruby-reserved rename
    # string ranges ("A".."I") -> explicit list; endless ranges (0..) in
    # subscripts -> python slices
    stmt = re.sub(
        r'"([A-Za-z])"\s*\.\.\s*"([A-Za-z])"',
        lambda m: repr([chr(c) for c in range(ord(m.group(1)),
                                              ord(m.group(2)) + 1)]),
        stmt)
    stmt = re.sub(r"(?<![.\w])(\d+)\.\.(?![.\d])",
                  lambda m: f"slice({m.group(1)}, None)", stmt)
    # Ruby regex literal stringified: /pat/.to_s == "(?-mix:pat)"
    # DOUBLE-quoted python literal: the single-quote branch of the string
    # pass re-escapes Ruby-literal backslashes and would double ours
    stmt = re.sub(
        r"/((?:[^/\\\n ]|\\.)+)/\.to_s(\(\))?",
        lambda m: '"' + ("(?-mix:" + m.group(1).replace("\\/", "/") + ")")
        .replace("\\", "\\\\").replace('"', '\\"') + '"',
        stmt,
    )

    # string-protected pipeline: split into string and non-string segments,
    # transform only the non-string parts, then reassemble.
    segs = _segment(stmt)
    out = []
    for is_str, seg in segs:
        if is_str:
            if seg.startswith("'"):
                # Ruby single-quoted strings are LITERAL ('abc\b' is
                # backslash+b); Python applies escapes — double the
                # backslashes that are not themselves escaping ' or \
                body = seg[1:-1]
                body = re.sub(r"\\(?!['\\])", r"\\\\", body)
                seg = "'" + body + "'"
            out.append(seg)
        else:
            out.append(_translate_code_seg(seg))
    res = "".join(out)

    # block -> lambda (re-segment: the block body may contain strings)
    res = _translate_blocks(res)

    # kwarg / hash-symbol-key / symbol handling needs bracket context
    res = _context_pass(res)

    # zero-arg method call fixup
    res = _call_fixup(res, property_names, module_nocall)
    res = res.replace("\x00", ":")  # restore lambda colons

    res = res.replace("\n", " ")
    return res


def _segment(stmt):
    segs = []
    i, n, last = 0, len(stmt), 0
    while i < n:
        if stmt[i] in "\"'":
            if last < i:
                segs.append((False, stmt[last:i]))
            j = _skip_string(stmt, i)
            segs.append((True, stmt[i:j]))
            i = j
            last = i
        else:
            i += 1
    if last < n:
        segs.append((False, stmt[last:]))
    return segs


def _translate_code_seg(seg):
    # `Polars::X.new` WITHOUT parens (Ruby zero-arg ctor) needs explicit ()
    seg = re.sub(r"Polars::([A-Za-z_][A-Za-z0-9_]*)\.new(?!\s*\()",
                 r"pl.\1()", seg)
    seg = _CTOR_RE.sub(r"pl.\1", seg)
    seg = _CONST_RE.sub(r"pl.\1", seg)
    seg = _MODULE_RE.sub("pl.", seg)
    seg = _DATE_RE.sub("__date(", seg)
    seg = _DATETIME_RE.sub("__datetime(", seg)
    seg = _TIME_UTC_RE.sub("__datetime(", seg)
    seg = _BIGDEC_RE.sub("__bigdecimal(", seg)
    seg = _FLOAT_NAN_RE.sub('float("nan")', seg)
    seg = _FLOAT_INF_RE.sub('float("inf")', seg)
    seg = seg.replace("Math::PI", "__PI")
    # Ruby String methods inside blocks -> Python str equivalents
    seg = seg.replace(".delete_suffix(", ".removesuffix(")
    seg = seg.replace(".delete_prefix(", ".removeprefix(")
    seg = re.sub(r"\.downcase\b(?!\()", ".lower()", seg)
    seg = re.sub(r"\.upcase\b(?!\()", ".upper()", seg)
    # \x00 marks a lambda colon: _context_pass would mistake `x:` for a
    # Ruby kwarg and rewrite it to `x=` — restored in translate_statement
    seg = _LAMBDA_ARROW_RE.sub(
        lambda m: f"(lambda {m.group(1)}\x00 {m.group(2)})", seg)
    seg = re.sub(
        r"\b(nil|true|false)\b", lambda m: _WORD_MAP[m.group(1)], seg
    )
    if ".." in seg:
        seg = _RANGE_RE.sub(_range_sub, seg)
        if ".." in seg:
            raise TranslateError("unsupported range expression")
    seg = seg.replace("=>", ":")
    return seg


def _range_sub(m):
    lo, op, hi = int(m.group(1)), m.group(2), int(m.group(3))
    hi_excl = hi + 1 if op == ".." else hi
    return f"(__rng({lo}, {hi_excl}))"


def _translate_blocks(res):
    """``meth { |x| body }`` / ``meth(a) { |x| body }`` -> lambda argument."""
    while True:
        m = _BLOCK_RE.search(res)
        if m is None:
            return res
        args = ", ".join(a.strip() for a in m.group(1).split(","))
        lam = (f"lambda {args}\x00 {m.group(2)}" if args
               else f"lambda\x00 {m.group(2)}")
        before = res[: m.start()].rstrip()
        after = res[m.end():]
        if before.endswith(")"):
            # attach into the preceding call's arg list
            op = _matching_open(before, len(before) - 1)
            inner = before[op + 1 : -1].strip()
            call = before[:op]
            joined = f"{call}({inner}, {lam})" if inner else f"{call}({lam})"
            res = joined + after
        elif re.search(r"[A-Za-z0-9_!?]$", before):
            res = f"{before}({lam})" + after
        else:
            raise TranslateError("block not attached to a call")


def _matching_open(s, close_idx):
    depth = 0
    i = close_idx
    while i >= 0:
        c = s[i]
        if c in ")]}":
            depth += 1
        elif c in "([{":
            depth -= 1
            if depth == 0:
                return i
        i -= 1
    raise TranslateError("unbalanced call parentheses")


_IDENT_COLON_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*):(?=$|[\s,)\]}])")
_SYMBOL_RE = re.compile(r"(?<![A-Za-z0-9_:\"']):([A-Za-z_][A-Za-z0-9_]*)")


def _context_pass(res):
    """Resolve ``ident:`` (kwarg vs hash key) and ``:symbol`` by bracket
    context, skipping string literals."""
    out = []
    stack = []
    i, n = 0, len(res)
    while i < n:
        c = res[i]
        if c in "\"'":
            j = _skip_string(res, i)
            out.append(res[i:j])
            i = j
            continue
        if c in "([{":
            stack.append(c)
            out.append(c)
            i += 1
            continue
        if c in ")]}":
            if stack:
                stack.pop()
            out.append(c)
            i += 1
            continue
        m = _IDENT_COLON_RE.match(res, i)
        if m and (i == 0 or not (res[i - 1].isalnum() or res[i - 1] in "_:.\"'")):
            inner = stack[-1] if stack else "("
            if inner == "{":
                out.append(f'"{m.group(1)}":')
            else:
                out.append(f"{m.group(1)}=")
            i = m.end()
            continue
        m = _SYMBOL_RE.match(res, i)
        if m and (i == 0 or res[i - 1] not in ":\"'" ):
            out.append(f'"{m.group(1)}"')
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


_ATTR_RE = re.compile(r"\.([A-Za-z_][A-Za-z0-9_]*[!?]?)")

# Ruby predicate-name -> our API name
_METHOD_RENAMES = {}


def _call_fixup(res, property_names, module_nocall):
    """Append ``()`` to zero-arg method calls: ``.sum`` -> ``.sum()``,
    ``pl.all.`` -> ``pl.all().``.  Property/namespace accessors stay bare."""
    out = []
    i, n = 0, len(res)
    while i < n:
        c = res[i]
        if c in "\"'":
            j = _skip_string(res, i)
            out.append(res[i:j])
            i = j
            continue
        m = _ATTR_RE.match(res, i)
        if m:
            name = m.group(1)
            j = m.end()
            if name.endswith(("!", "?")):
                base = name[:-1]
                if base in _METHOD_RENAMES:
                    name = _METHOD_RENAMES[base]
                else:
                    raise TranslateError(f"ruby predicate method .{name}")
            nxt = res[j] if j < n else ""
            is_call = nxt == "("
            is_assign = nxt == " " and res[j : j + 2] == "= " and res[j : j + 3] != "== "
            prev = out[-1][-1] if out and out[-1] else ""
            is_module = "".join(out).rstrip().endswith("pl")
            if is_call or is_assign:
                out.append("." + name)
            elif is_module and name[0].isupper():
                out.append("." + name)  # dtype class reference
            elif is_module and name in module_nocall:
                out.append("." + name)
            elif not is_module and name in property_names:
                out.append("." + name)
            elif re.match(r"\d", name):
                out.append("." + name)  # float literal like 1.5 (not attr)
            else:
                out.append("." + name + "()")
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# public API


def property_surface():
    """Introspect our package for attribute names that must NOT get ``()``."""
    import inspect
    import polars_ruby_spark as pl

    names = set()
    for cls_name in (
        "DataFrame",
        "LazyFrame",
        "Series",
        "Expr",
        "GroupBy",
        "LazyGroupBy",
    ):
        cls = getattr(pl, cls_name, None)
        if cls is None:
            continue
        for n in dir(cls):
            if n.startswith("_"):
                continue
            if isinstance(inspect.getattr_static(cls, n), property):
                names.add(n)
    # module-level names that are values (dtype classes handled by case rule)
    module_nocall = {n for n in dir(pl) if n[0:1].isupper()}
    return names, module_nocall


def _strip_line_comment(ln):
    """Drop a trailing Ruby comment (string-aware; ``#{`` stays — it is
    caught as unsupported interpolation)."""
    i, n = 0, len(ln)
    while i < n:
        ch = ln[i]
        if ch in "\"'":
            j = _skip_string(ln, i)
            i = j
            continue
        if ch == "#" and not ln[i:i + 2] == "#{":
            return ln[:i].rstrip()
        i += 1
    return ln


def translate_example(code_lines, property_names, module_nocall):
    """Translate one example's Ruby code into a list of Python statements."""
    stmts = join_logical(
        [_strip_line_comment(ln) for ln in code_lines
         if not ln.strip().startswith("require ")]
    )
    py = []
    for st in stmts:
        if st.strip().startswith("#"):
            continue
        py.append(translate_statement(st, property_names, module_nocall))
    if not py:
        raise TranslateError("no executable statements")
    return py
