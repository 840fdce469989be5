"""Semantic comparison of executed results vs the reference's rendered output.

The reference harness (``test/docs_test.rb:192-203``) string-compares the
rendered table.  We compare *semantically* instead: parse the expected
polars-rendered block back into (shape, columns, dtypes, cell values) and
check our computed frame against it.  This is robust to cosmetic rendering
differences (True vs true, float padding, column widths) while still checking
values, order, column names, and dtypes.

Dtype deviations that SURVEY.md §1.3 documents (u8/u16/u32 -> wider signed,
u64 -> decimal[20,0], cat/enum -> str, datetime[ns] -> datetime[μs],
time -> i64) are accepted but reported as ``pass_dev`` so the ledger shows
exactly where the engine deviates.
"""

import datetime
import math
import re

# expected dtype -> set of our acceptable short dtypes (documented deviations)
_DTYPE_DEV = {
    "u8": {"i8", "i16", "i32", "i64"},
    "u16": {"i16", "i32", "i64"},
    "u32": {"i32", "i64"},
    "u64": {"decimal[20,0]", "i64"},
    "i8": {"i8", "i16", "i32", "i64"},
    "i16": {"i16", "i32", "i64"},
    "i32": {"i32", "i64"},
    "cat": {"str"},
    "enum": {"str"},
    "datetime[ns]": {"datetime[μs]"},
    "datetime[ms]": {"datetime[μs]"},
    "duration[ns]": {"duration[μs]"},
    "duration[ms]": {"duration[μs]"},
    "time": {"i64"},
    "object": {"str"},
}


class CompareError(Exception):
    def __init__(self, reason):
        super().__init__(reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# expected-block parsing


def parse_expected_block(lines):
    """Classify and parse the expected rendered block."""
    lines = [ln.rstrip() for ln in lines if ln.strip()]
    if not lines:
        raise CompareError("empty expected block")
    m = re.match(r"shape: \((\d+),\s*(\d+)?\)?", lines[0].replace("_", ""))
    if m and m.group(2) is not None:
        return _parse_frame(lines, int(m.group(1)), int(m.group(2)))
    m2 = re.match(r"shape: \((\d+),\)", lines[0].replace("_", ""))
    if m2:
        return _parse_series(lines, int(m2.group(1)))
    return {"kind": "text", "text": "\n".join(lines)}


def _parse_frame(lines, nrows, ncols):
    header = None
    dtypes = None
    rows = []
    seen_sep = False
    for ln in lines[1:]:
        if not ln.startswith("│"):
            if ln.startswith("╞"):
                seen_sep = True
            continue
        cells = [c.strip() for c in ln.strip("│").split("┆")]
        if header is None:
            header = cells
        elif cells == ["---"] * len(cells):
            continue
        elif dtypes is None and not seen_sep:
            dtypes = cells
        else:
            rows.append(cells)
    if header is None or dtypes is None:
        raise CompareError("unparseable frame block")
    # multi-line header/dtype continuation rows are rare; bail if widths differ
    if any(len(r) != len(header) for r in rows):
        raise CompareError("ragged table rows (wrapped cells)")
    return {
        "kind": "frame",
        "shape": (nrows, ncols),
        "columns": header,
        "dtypes": dtypes,
        "rows": rows,
    }


def _parse_series(lines, nrows):
    m = re.match(r"Series: '(.*)' \[(.+)\]", lines[1]) if len(lines) > 1 else None
    if not m:
        raise CompareError("unparseable series block")
    name, dtype = m.group(1), m.group(2)
    vals = []
    for ln in lines[2:]:
        s = ln.strip()
        if s in ("[", "]"):
            continue
        vals.append(s.replace("\t", ""))
    return {
        "kind": "series",
        "shape": (nrows,),
        "name": name,
        "dtype": dtype,
        "values": vals,
    }


# ---------------------------------------------------------------------------
# cell parsing

_DURATION_TOK = re.compile(r"(-?\d+)(d|h|m(?!s)|s|ms|µs|us|ns)")
_DUR_FACTORS = {
    "d": 86400_000_000,
    "h": 3600_000_000,
    "m": 60_000_000,
    "s": 1_000_000,
    "ms": 1_000,
    "µs": 1,
    "us": 1,
    "ns": 0,  # sub-microsecond: truncates in our engine
}


def parse_cell(text, dtype):
    """Parse one rendered cell into a comparable Python value."""
    if text == "null":
        return None
    if text == "…":
        return Ellipsis
    base = dtype.split("[")[0]
    if base in ("i8", "i16", "i32", "i64", "u8", "u16", "u32", "u64"):
        return int(text)
    if base in ("f32", "f64"):
        return _parse_float(text)
    if base == "decimal":
        return _parse_float(text)
    if base == "bool":
        return text == "true"
    if base == "date":
        return datetime.date.fromisoformat(text)
    if base == "datetime":
        return _parse_datetime(text)
    if base == "duration":
        return _parse_duration(text)
    if base == "time":
        return _parse_time(text)
    if base in ("str", "cat", "enum", "object"):
        return text
    if base in ("list", "array"):
        inner = dtype[dtype.index("[") + 1 : -1]
        if base == "array":
            inner = inner.rsplit(",", 1)[0].strip()  # "i64, 3" -> "i64"
        return _parse_list(text, inner)
    if base == "struct":
        return _parse_struct(text)
    if base == "binary":
        return _parse_binary(text)
    if base == "null":
        return None
    raise CompareError(f"cell dtype {dtype!r} not supported")


class ApproxFloat:
    """Float parsed from a rendered cell; == uses display-precision tolerance."""

    def __init__(self, text):
        self.text = text
        self.value = float(text.replace("inf", "inf").replace("NaN", "nan"))
        # tolerance from shown precision: half a unit in the last place shown
        m = re.match(r"-?\d+\.(\d+)(e(-?\d+))?$", text)
        if m:
            frac = len(m.group(1))
            exp = int(m.group(3) or 0)
            self.tol = 0.51 * 10 ** (exp - frac)
        else:
            m2 = re.match(r"-?\d+(e(-?\d+))?$", text)
            exp = int(m2.group(2) or 0) if m2 else 0
            self.tol = 0.51 * 10**exp if exp else 1e-9
        self.tol = max(self.tol, abs(self.value) * 1e-9)

    def matches(self, other):
        if other is None:
            return False
        other = float(other)
        if math.isnan(self.value):
            return math.isnan(other)
        if math.isinf(self.value):
            return self.value == other
        return abs(other - self.value) <= self.tol

    def __repr__(self):
        return f"~{self.text}"


def _parse_float(text):
    return ApproxFloat(text)


def _parse_datetime(text):
    tz = None
    m = re.match(r"(.*?)\s+([A-Z]{2,5}|[+-]\d{2}:\d{2})$", text)
    if m:
        text, tz = m.group(1), m.group(2)
    try:
        val = datetime.datetime.fromisoformat(text.replace(" ", "T"))
    except ValueError as e:
        raise CompareError(f"datetime cell {text!r}: {e}")
    return (val, tz) if tz else val


def _parse_duration(text):
    total = 0
    matched = False
    for m in _DURATION_TOK.finditer(text.replace(" ", "")):
        total += int(m.group(1)) * _DUR_FACTORS[m.group(2)]
        matched = True
    if not matched:
        raise CompareError(f"duration cell {text!r}")
    if text.lstrip().startswith("-") and total > 0:
        total = -total
    return datetime.timedelta(microseconds=total)


def _parse_time(text):
    h, mi, rest = text.split(":")
    if "." in rest:
        sec, frac = rest.split(".")
        frac_ns = int(frac.ljust(9, "0")[:9])
    else:
        sec, frac_ns = rest, 0
    return ((int(h) * 3600 + int(mi) * 60 + int(sec)) * 1_000_000_000) + frac_ns


def _parse_list(text, inner_dtype):
    if text.startswith("[") and text.endswith("…") and not text.endswith("]"):
        # cell WIDTH-truncated mid-element: compare the complete prefix
        parts = _split_top(text[1:])
        out = [parse_cell(p.strip(), inner_dtype) if not
               (p.strip().startswith('"') and p.strip().endswith('"'))
               else p.strip()[1:-1] for p in parts[:-1] if p.strip()]
        out.append(Ellipsis)
        return out
    if not (text.startswith("[") and text.endswith("]")):
        raise CompareError(f"list cell {text!r}")
    parts = _split_top(text[1:-1])
    out = []
    for p in parts:
        p = p.strip()
        if not p:
            continue
        if p.startswith("… "):
            # elided list tail renders "… last" with no comma
            out.append(Ellipsis)
            p = p[2:].strip()
        if p == "…":
            out.append(Ellipsis)
        elif p.startswith('"') and p.endswith('"'):
            out.append(p[1:-1])
        else:
            out.append(parse_cell(p, inner_dtype))
    return out


def _parse_struct(text):
    if not (text.startswith("{") and text.endswith("}")):
        raise CompareError(f"struct cell {text!r}")
    parts = _split_top(text[1:-1])
    out = []
    for p in parts:
        p = p.strip()
        if p == "null":
            out.append(None)
        elif p.startswith('"') and p.endswith('"'):
            out.append(p[1:-1])
        elif re.match(r"^-?\d+$", p):
            out.append(int(p))
        elif re.match(r"^-?\d*\.\d+(e-?\d+)?$", p) or p in ("inf", "-inf", "NaN"):
            out.append(ApproxFloat(p))
        elif p in ("true", "false"):
            out.append(p == "true")
        elif p.startswith("["):
            out.append(_parse_list(p, "str"))  # inner dtype unknown; strings quoted
        elif re.match(r"^\d{4}-\d{2}-\d{2}", p):
            out.append(parse_cell(p, "datetime" if ":" in p else "date"))
        else:
            out.append(p)
    return tuple(out)


def _parse_binary(text):
    if text.startswith('b"') and text.endswith('"'):
        body = text[2:-1]
        try:
            return body.encode("utf-8").decode("unicode_escape").encode("latin-1")
        except Exception:
            return body.encode()
    raise CompareError(f"binary cell {text!r}")


def _split_top(s):
    """Split on commas at nesting depth 0, respecting quotes/brackets."""
    parts, depth, cur, i, n = [], 0, "", 0, len(s)
    while i < n:
        c = s[i]
        if c == '"':
            j = i + 1
            while j < n and s[j] != '"':
                j += 2 if s[j] == "\\" else 1
            cur += s[i : j + 1]
            i = j + 1
            continue
        if c in "[{(":
            depth += 1
        elif c in "]})":
            depth -= 1
        if c == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += c
        i += 1
    if cur.strip():
        parts.append(cur)
    return parts


# ---------------------------------------------------------------------------
# value comparison


def value_matches(ours, exp):
    """Compare our collected value against a parsed expected cell value."""
    if exp is Ellipsis:
        return True
    if isinstance(exp, ApproxFloat):
        if ours is None:
            return False
        if isinstance(ours, bool):
            return False
        try:
            return exp.matches(ours)
        except (TypeError, ValueError):
            return False
    if exp is None:
        if isinstance(ours, float) and math.isnan(ours):
            return False
        return ours is None
    if isinstance(exp, str):
        if ours is None:
            return False
        ostr = _to_cell_str(ours)
        if exp.endswith("…"):
            return ostr.startswith(exp[:-1])
        if ostr == exp:
            return True
        # table cells lose leading/trailing whitespace in rendering
        return ostr.strip() == exp and exp == exp.strip()
    if isinstance(exp, bool):
        return ours is exp or ours == exp
    if isinstance(exp, int):
        if isinstance(ours, bool) or ours is None:
            return False
        try:
            return int(ours) == exp
        except (TypeError, ValueError):
            return False
    if isinstance(exp, datetime.datetime):
        return _dt_matches(ours, exp, None)
    if isinstance(exp, tuple) and len(exp) == 2 and isinstance(exp[0], datetime.datetime):
        return _dt_matches(ours, exp[0], exp[1])
    if isinstance(exp, datetime.date):
        return ours == exp
    if isinstance(exp, datetime.timedelta):
        return ours == exp
    if isinstance(exp, list):
        return _list_matches(ours, exp)
    if isinstance(exp, tuple):  # struct
        if ours is None:
            return False
        vals = list(ours) if not isinstance(ours, dict) else list(ours.values())
        if hasattr(ours, "asDict"):
            vals = list(ours.asDict().values())
        if len(vals) != len(exp):
            return False
        return all(value_matches(v, e) for v, e in zip(vals, exp))
    if isinstance(exp, bytes):
        return ours == exp
    return ours == exp


def _dt_matches(ours, exp, tz):
    if ours is None:
        return False
    if isinstance(ours, datetime.datetime):
        o = ours.replace(tzinfo=None)
        if tz and ours.tzinfo is not None and tz.startswith(("+", "-")):
            off = datetime.timedelta(
                hours=int(tz[1:3]), minutes=int(tz[4:6])
            ) * (1 if tz[0] == "+" else -1)
            o = (ours.astimezone(datetime.timezone.utc) + off).replace(tzinfo=None)
        return o == exp
    return False


def _list_matches(ours, exp):
    if ours is None:
        return False
    ours = list(ours)
    if Ellipsis in exp:
        k = exp.index(Ellipsis)
        head, tail = exp[:k], exp[k + 1 :]
        if len(ours) < len(head) + len(tail):
            return False
        return all(value_matches(o, e) for o, e in zip(ours[: len(head)], head)) and all(
            value_matches(o, e)
            for o, e in zip(ours[len(ours) - len(tail) :], tail)
        )
    if len(ours) != len(exp):
        return False
    return all(value_matches(o, e) for o, e in zip(ours, exp))


def _to_cell_str(ours):
    if isinstance(ours, str):
        return ours
    if isinstance(ours, bool):
        return "true" if ours else "false"
    return str(ours)


def dtype_matches(exp_dtype, our_dtype):
    """Return 'exact' | 'dev' | None."""
    if exp_dtype == our_dtype:
        return "exact"
    if exp_dtype.startswith("decimal[*"):  # wildcard precision
        if our_dtype.startswith("decimal[") and our_dtype.endswith(
                exp_dtype.rsplit(",", 1)[1]):
            return "exact"
    if our_dtype in _DTYPE_DEV.get(exp_dtype, ()):
        return "dev"
    eb, ob = exp_dtype.split("[")[0], our_dtype.split("[")[0]
    if eb == "datetime" and ob == "datetime" and "," in exp_dtype \
            and "," not in our_dtype:
        # tz-aware dtype renders naive: no per-column tz metadata
        # (SURVEY §1.3); values are the local wall times
        return "dev"
    if eb in ("list", "array") and ob in ("list", "array"):
        ei = exp_dtype[exp_dtype.index("[") + 1 : -1] if "[" in exp_dtype else "?"
        oi = our_dtype[our_dtype.index("[") + 1 : -1] if "[" in our_dtype else "?"
        if eb == "array":
            ei = ei.rsplit(",", 1)[0].strip()
        if oi == ei:
            return "exact" if eb == ob else "dev"
        inner = dtype_matches(ei, oi)
        return "dev" if inner else None
    if eb == "struct" and ob == "struct":
        return "exact" if exp_dtype == our_dtype else "dev"
    return None
