"""Exception hierarchy (parity: lib/polars/exceptions.rb:1-33).

The reference funnels engine faults through a small set of classes; ours
map the same names so rescue/except blocks port 1:1.  Spark analysis and
execution errors are not wrapped wholesale (the Py4J traceback carries the
actionable detail) — these classes are raised by OUR layer where the
reference raises them.
"""

from __future__ import annotations


class Error(Exception):
    """Base class for all engine errors."""


class InvalidOperationError(Error):
    pass


class InvalidAssert(Error):
    pass


class RowsException(Error):
    pass


class NoRowsReturned(RowsException):
    pass


class TooManyRowsReturned(RowsException):
    pass


class AssertionError(Error):  # noqa: A001 — reference name
    pass


class Todo(Error):
    """Raised by intentionally-unimplemented paths (exceptions.rb:29-33)."""

    def __init__(self, message: str = "not implemented yet"):
        super().__init__(message)


class ComputeError(Error):
    pass


class SchemaError(Error):
    pass
