"""Multi-format date normalization (reference F7).

The reference normalizes messy date strings from ~16 formats to
``'%d %B %Y'`` via a chain of strptime fallbacks plus custom quarter /
semester arithmetic (``SemLink/data_loader.py:20-133``). Here that
becomes a single ``coalesce`` chain of ``to_date`` attempts plus
regexp-driven quarter/semester branches — fully declarative, so Catalyst
constant-folds and pushes it down; no UDF.

Output convention matches the reference: ``'dd MMMM yyyy'``
(e.g. ``04 March 1995``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime-style fallbacks the reference iterates over (data_loader.py:86-110),
# expressed as Spark datetime patterns.
_PLAIN_FORMATS = [
    "yyyy-MM-dd",
    "dd/MM/yyyy",
    "MM/dd/yyyy",
    "yyyyMMdd",
    "yyyy/MM/dd",
    "dd-MM-yyyy",
    "dd MMMM yyyy",
    "MMMM dd, yyyy",
    "dd MMM yyyy",
    "yyyy-MM",
    "MM/yyyy",
    "yyyy",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.

    Spark 4.1 restricts ``unix_micros()`` to TIMESTAMP_LTZ, but parquet
    written with ``isAdjustedToUTC=false`` reads as TIMESTAMP_NTZ. The
    NTZ→LTZ cast interprets the wall-clock in the session timezone —
    exact and DST-free because the session pins
    ``spark.sql.session.timeZone=UTC`` (session.py); for LTZ input the
    cast is a no-op."""
    return F.unix_micros(_c(col).cast("timestamp"))


def parse_date_multi(col: Column | str) -> Column:
    """Best-effort parse of a messy date string → DATE (null if hopeless)."""
    s = F.trim(_c(col))
    attempts = [F.try_to_timestamp(s, F.lit(fmt)).cast("date") for fmt in _PLAIN_FORMATS]

    # YYYY-Qn quarter → first month of quarter (data_loader.py:40-52).
    q_year = F.regexp_extract(s, r"^(\d{4})-?[Qq]([1-4])$", 1)
    q_num = F.regexp_extract(s, r"^(\d{4})-?[Qq]([1-4])$", 2)
    quarter = F.when(
        q_year != "",
        F.make_date(q_year.cast("int"), (q_num.cast("int") - 1) * 3 + 1, F.lit(1)),
    )

    # YYYY-Sn / YYYY-Hn semester → month 1 or 7 (data_loader.py:54-66).
    s_year = F.regexp_extract(s, r"^(\d{4})-?[SsHh]([1-2])$", 1)
    s_num = F.regexp_extract(s, r"^(\d{4})-?[SsHh]([1-2])$", 2)
    semester = F.when(
        s_year != "",
        F.make_date(s_year.cast("int"), (s_num.cast("int") - 1) * 6 + 1, F.lit(1)),
    )

    return F.coalesce(quarter, semester, *attempts)


def normalize_date(col: Column | str) -> Column:
    """Messy date string → canonical ``'dd MMMM yyyy'`` string (or null)."""
    return F.date_format(parse_date_multi(col), "dd MMMM yyyy")


# --- DuckDB twin ---------------------------------------------------------

_DUCK_FORMATS = [
    "%Y-%m-%d",
    "%d/%m/%Y",
    "%m/%d/%Y",
    "%Y%m%d",
    "%Y/%m/%d",
    "%d-%m-%Y",
    "%d %B %Y",
    "%B %d, %Y",
    "%d %b %Y",
    "%Y-%m",
    "%m/%Y",
    "%Y",
]


def parse_date_multi_sql(expr: str) -> str:
    s = f"trim({expr})"
    attempts = ", ".join(f"try_strptime({s}, '{f}')::DATE" for f in _DUCK_FORMATS)
    quarter = (
        f"(case when regexp_matches({s}, '^\\d{{4}}-?[Qq][1-4]$') then "
        f"make_date(regexp_extract({s}, '^(\\d{{4}})', 1)::INT, "
        f"(regexp_extract({s}, '[Qq]([1-4])$', 1)::INT - 1) * 3 + 1, 1) end)"
    )
    semester = (
        f"(case when regexp_matches({s}, '^\\d{{4}}-?[SsHh][1-2]$') then "
        f"make_date(regexp_extract({s}, '^(\\d{{4}})', 1)::INT, "
        f"(regexp_extract({s}, '[SsHh]([1-2])$', 1)::INT - 1) * 6 + 1, 1) end)"
    )
    return f"coalesce({quarter}, {semester}, {attempts})"


def normalize_date_sql(expr: str) -> str:
    return f"strftime({parse_date_multi_sql(expr)}, '%d %B %Y')"
