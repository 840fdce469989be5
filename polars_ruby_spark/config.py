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

    # remaining display-formatting toggles (config.rb:116-525): stored so
    # Config.state round-trips; Spark-side repr is plain-text, most have no
    # visual effect here (accepted state, documented no-op rendering)
    @staticmethod
    def activate_decimals(active: bool = True):
        _STATE["decimals"] = bool(active)

    @staticmethod
    def set_ascii_tables(active: bool = True):
        _STATE["ascii_tables"] = bool(active)

    @staticmethod
    def set_auto_structify(active: bool = True):
        _STATE["auto_structify"] = bool(active)

    @staticmethod
    def set_fmt_float(fmt: str = "mixed"):
        if fmt not in ("mixed", "full"):
            raise ValueError("fmt_float must be 'mixed' or 'full'")
        _STATE["fmt_float"] = fmt

    @staticmethod
    def set_tbl_cell_alignment(format: str):
        if format not in ("LEFT", "CENTER", "RIGHT"):
            raise ValueError("alignment must be LEFT/CENTER/RIGHT")
        _STATE["tbl_cell_alignment"] = format

    @staticmethod
    def set_tbl_column_data_type_inline(active: bool = True):
        _STATE["tbl_dtype_inline"] = bool(active)

    @staticmethod
    def set_tbl_dataframe_shape_below(active: bool = True):
        _STATE["tbl_shape_below"] = bool(active)

    @staticmethod
    def set_tbl_formatting(format=None, rounded_corners: bool = False):
        _STATE["tbl_formatting"] = (format, bool(rounded_corners))

    @staticmethod
    def set_tbl_hide_column_data_types(active: bool = True):
        _STATE["tbl_hide_dtypes"] = bool(active)

    @staticmethod
    def set_tbl_hide_column_names(active: bool = True):
        _STATE["tbl_hide_names"] = bool(active)

    @staticmethod
    def set_tbl_hide_dtype_separator(active: bool = True):
        _STATE["tbl_hide_dtype_sep"] = bool(active)

    @staticmethod
    def set_tbl_hide_dataframe_shape(active: bool = True):
        _STATE["tbl_hide_shape"] = bool(active)

    @staticmethod
    def set_tbl_width_chars(width: int):
        _STATE["tbl_width_chars"] = int(width)

    _DEFAULTS = {"tbl_rows": 10, "tbl_cols": 8, "fmt_str_lengths": 30}

    @classmethod
    def restore_defaults(cls):
        # random_seed is set via Polars.set_random_seed (a module fn, not a
        # Config option) — a Config reset must not clear it
        seed = _STATE.get("random_seed")
        _STATE.clear()
        _STATE.update(cls._DEFAULTS)
        if seed is not None:
            _STATE["random_seed"] = seed

    @classmethod
    def state(cls, if_set: bool = False, env_only: bool = False):
        """config.rb:94 — current option mapping."""
        if env_only:
            return {}
        if if_set:
            return {k: v for k, v in _STATE.items()
                    if cls._DEFAULTS.get(k) != v}
        return dict(_STATE)

    @classmethod
    def save(cls) -> str:
        import json

        return json.dumps(_STATE)

    @classmethod
    def load(cls, cfg: str):
        import json

        cls.restore_defaults()
        _STATE.update(json.loads(cfg))
        return cls


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
