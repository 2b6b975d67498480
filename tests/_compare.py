"""Shared Spark↔DuckDB comparison helpers (driver-gate replica)."""

from __future__ import annotations

import datetime as dt
import decimal
import math

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (dt.datetime, dt.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _dtype_class(series) -> str:
    """Collapse a pandas dtype to the class the driver's value-hash
    distinguishes: '3' (int) vs '3.0' (float) hash differently, so an
    oracle column that pandas-converts to float64 (DuckDB HUGEINT does)
    while Spark yields int64 is a driver red even when values match."""
    from pandas.api import types as pt

    if pt.is_bool_dtype(series):
        return "bool"
    if pt.is_integer_dtype(series):
        return "int"
    if pt.is_float_dtype(series):
        return "float"
    if pt.is_datetime64_any_dtype(series):
        return "datetime"
    # Object columns: classify by the first non-null value so that
    # datetime.date objects (Spark DateType via toPandas) compare equal
    # to DuckDB's datetime64 DATE conversion, as they do in the driver.
    for v in series:
        if v is None:
            continue
        try:
            if v != v:  # NaN
                continue
        except Exception:
            pass
        if isinstance(v, (dt.datetime, dt.date)):
            return "datetime"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        return "object"
    return "empty"


def pandas_probe(s_pdf, d_pdf) -> list[str]:
    """Replicate the driver's pandas canonicalization path.

    The driver converts BOTH results to pandas, sorts by every column
    (``sort_values`` raises TypeError on list/dict cells), then hashes
    stringified values (so int64 3 != float64 3.0). This probe fails in
    exactly those two spots so the local gate is red wherever the
    driver gate would be (VERDICT r3 'What's wrong' #3)."""
    problems = []
    for label, pdf in (("spark", s_pdf), ("duck", d_pdf)):
        try:
            pdf.sort_values(by=sorted(pdf.columns))
        except TypeError as e:
            problems.append(
                f"driver-canon: {label} result not pandas-sortable ({e}); "
                "serialize array/map/struct output columns to strings in "
                "the gated projection"
            )
    if problems:
        return problems
    for col in sorted(set(s_pdf.columns) & set(d_pdf.columns)):
        sk, dk = _dtype_class(s_pdf[col]), _dtype_class(d_pdf[col])
        if "empty" in (sk, dk):
            continue
        if sk != dk:
            problems.append(
                f"driver-canon: column {col!r} pandas dtype class "
                f"spark={sk} duck={dk} (driver hashes e.g. '3' vs '3.0' "
                "differently; cast the oracle, e.g. ::BIGINT)"
            )
    return problems


def compare(sdf, con, sql: str) -> list[str]:
    """Return a list of problems (empty = match), mimicking the
    driver's row-count + schema + order-insensitive value-hash gate —
    including its pandas conversion path (DuckDB via ``.df()``, Spark
    via ``toPandas()``), which is where HUGEINT→float64 and unsortable
    array columns bite."""
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    problems = []
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if not problems:
        cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
        if cs != cd:
            diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            problems.append(f"values differ; first diffs: {diff}")
    if not problems:
        # Same conversion paths as the driver: Spark toPandas(),
        # DuckDB .df() — this is where HUGEINT becomes float64 and
        # array cells break sort_values.
        problems.extend(pandas_probe(sdf.toPandas(), con.sql(sql).df()))
    return problems
