"""chrono (strftime) format strings → Java DateTimeFormatter patterns.

The reference parses/prints datetimes with Rust chrono formats
(``/root/reference/lib/polars/string_expr.rb:40`` ``to_date(format:)``,
``date_time_expr.rb:263`` ``to_string``).  Spark's ``to_date``/``date_format``
speak Java patterns; this translator bridges the dialects.
"""

from __future__ import annotations

_MAP = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "e": "d",
    "H": "HH",
    "I": "hh",
    "M": "mm",
    "S": "ss",
    "f": "SSSSSS",
    "3f": "SSS",
    "6f": "SSSSSS",
    "9f": "SSSSSS",  # Spark timestamps are µs; ns digits are not representable
    "b": "MMM",
    "B": "MMMM",
    "h": "MMM",
    "a": "EEE",
    "A": "EEEE",
    "j": "DDD",
    "p": "a",
    "z": "xx",
    ":z": "xxx",
    "#z": "X",   # chrono "optional colon / Z" offset — Java X parses Z, +01
    "Z": "zz",
    "G": "YYYY",  # ISO week year
    "V": "ww",    # ISO week number
    "u": "e",     # ISO weekday (Mon=1)
    "s": "",      # epoch seconds — no direct pattern; callers use unix_timestamp
    "T": "HH:mm:ss",
    "D": "MM/dd/yy",
    # chrono %c = "%a %b %e %T %Y" (ctime).  Spark's parser rejects EEE on
    # the PARSE side, so namespaces._ctime_norm strips the weekday name,
    # collapses the %e double space, and clamps leap-second :60
    "c": "MMM d HH:mm:ss yyyy",
    "F": "yyyy-MM-dd",
    "R": "HH:mm",
    # chrono no-pad modifier (%-d etc.) → Java single-letter = unpadded
    "-d": "d",
    "-m": "M",
    "-H": "H",
    "-M": "m",
    "-S": "s",
    "-I": "h",
    "-j": "D",
    "-y": "yy",
}


def chrono_to_java(fmt: str) -> str:
    """Translate a chrono strftime pattern to a Java DateTimeFormatter pattern."""
    out: list[str] = []
    lit: list[str] = []

    def flush_literal() -> None:
        if lit:
            text = "".join(lit)
            # Java patterns need quoting for letters.
            if any(c.isalpha() for c in text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            lit.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            lit.append(c)
            i += 1
            continue
        # lookahead for %%, %.3f style, %:z
        if i + 1 < len(fmt) and fmt[i + 1] == "%":
            lit.append("%")
            i += 2
            continue
        flush_literal()
        j = i + 1
        if j < len(fmt) and fmt[j] == ".":  # %.3f / %.f fractional forms
            j += 1
        key = ""
        while j < len(fmt):
            key += fmt[j]
            j += 1
            if key in _MAP or key.rstrip("f") == "" or len(key) > 2:
                break
        key = key.lstrip(".")
        if key not in _MAP:
            raise ValueError(f"unsupported chrono directive %{key} in {fmt!r}")
        out.append(_MAP[key])
        i = j
    flush_literal()
    return "".join(out)
