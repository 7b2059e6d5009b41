"""Date parsing helpers.

The reference's fixtures store dates as strings in two formats — ``MM/DD/YYYY``
(dirty.csv "Date Joined") and ISO ``YYYY-MM-DD`` (dirty_hr.csv "join_date") —
and its generated pandas programs parse whichever appears (SURVEY §1.2; T10).
Parse failure yields null (pandas ``errors='coerce'`` semantics), never an
error, so downstream validation filters can see the bad rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Formats observed in the reference fixtures, tried in order (T10).
DEFAULT_DATE_FORMATS: tuple[str, ...] = ("yyyy-MM-dd", "MM/dd/yyyy")


def to_date_multi(col: Column | str, formats: tuple[str, ...] = DEFAULT_DATE_FORMATS) -> Column:
    """Parse a string column trying several formats; first success wins.

    ``try_to_date`` returns null on mismatch (pandas ``errors='coerce'``
    parity even under Spark 4's default ANSI mode), so ``coalesce`` over
    per-format parses implements "try each format" as a single codegen'd
    expression — no UDF, fully pushdown-friendly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_date(c, fmt) for fmt in formats])
