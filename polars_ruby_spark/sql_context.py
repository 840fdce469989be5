"""SQLContext: register frames as named tables, run SQL.

Parity: ``/root/reference/lib/polars/sql_context.rb:89`` (execute), ``:116``
(register), ``:176`` (SHOW TABLES).  100% native here: temp views +
``spark.sql`` (SURVEY §2.11).
"""

from __future__ import annotations

import re as _re

from .frame import DataFrame, LazyFrame
from .session import get_spark


class SQLContext:
    def __init__(self, frames: dict | None = None, eager: bool = False, **named):
        self._eager = eager
        self._tables: set[str] = set()
        all_frames = dict(frames or {})
        all_frames.update(named)
        for name, frame in all_frames.items():
            self.register(name, frame)

    def register(self, name: str, frame) -> "SQLContext":
        if frame is None:
            return self.unregister(name)
        sdf = frame.to_spark() if isinstance(frame, LazyFrame) else frame
        sdf.createOrReplaceTempView(name)
        self._tables.add(name)
        return self

    def register_many(self, frames: dict) -> "SQLContext":
        for name, frame in frames.items():
            self.register(name, frame)
        return self

    def unregister(self, name) -> "SQLContext":
        names = name if isinstance(name, (list, tuple, set)) else [name]
        for n in names:
            get_spark().catalog.dropTempView(n)
            self._tables.discard(n)
        return self

    def execute(self, query: str, eager: bool | None = None):
        if query.strip().rstrip(";").upper() == "SHOW TABLES":
            # scope to THIS context's registrations (sql_context.rb:176
            # doctest) — the session catalog holds every test's temp views
            from .sources.io import from_hash

            out = from_hash({"name": sorted(self._tables)})
            return out if (eager if eager is not None else self._eager) \
                else out.lazy()
        # polars' SQL dialect tolerates a trailing comma before FROM
        # (sql_context.rb execute doctest); Spark's parser does not
        query = _re.sub(r",(\s*)(FROM\b)", r"\1\2", query, flags=_re.I)
        sdf = get_spark().sql(query)
        if eager if eager is not None else self._eager:
            return DataFrame(sdf)
        return LazyFrame(sdf)

    def tables(self) -> list[str]:
        return sorted(self._tables)
