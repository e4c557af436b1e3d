"""Local replica of the driver's t2 correctness gate: every registered
query runs on Spark AND its oracle SQL runs on DuckDB over the same
parquet; row-count, sorted column names, and the order-insensitive value
multiset must match exactly.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import re

import duckdb
import pytest

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import (
    ORACLES,
    QUERIES,
)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, decimal.Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("ts", dt.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, bytes):
        return ("by", v)
    return ("s", str(v))


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def oracle_result(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return cols, rows
    finally:
        con.close()


# DuckDB types that have no Spark physical twin: the driver's hasher
# preserves the oracle result's physical (Arrow) type, so an output
# column of HUGEINT (int128, DuckDB's default for integer SUM) or
# DECIMAL hash-mismatches a value-identical Spark BIGINT/DOUBLE column.
# _canon below folds these to Python scalars, which is why the value
# compare alone could never catch it (r5 verdict: five driver reds, all
# this artifact). Every oracle's *declared* output type must therefore
# avoid these — wrap integer SUMs in CAST(... AS BIGINT).
_FORBIDDEN_ORACLE_TYPES = re.compile(
    r"\b(HUGEINT|UHUGEINT|DECIMAL|UBIGINT|UINTEGER|USMALLINT|UTINYINT)\b",
    re.IGNORECASE,
)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types(sf_small, name):
    """Binder-only check (no execution): fail any oracle whose declared
    output schema contains a DuckDB type Spark cannot produce."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
            )
        rel = con.sql(ORACLES[name])
        bad = [
            (c, str(tp))
            for c, tp in zip(rel.columns, rel.types)
            if _FORBIDDEN_ORACLE_TYPES.search(str(tp))
        ]
        assert not bad, (
            f"{name}: oracle output columns use DuckDB types the driver's "
            f"hasher cannot match against Spark: {bad}; CAST them "
            f"(integer SUM -> BIGINT, DECIMAL -> DOUBLE)"
        )
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_small, name):
    if name not in ORACLES:
        # rows-only check, mirroring the driver's weaker gate
        df = QUERIES[name](spark, sf_small)
        assert len(df.columns) > 0
        assert df.count() >= 0
        return
    sdf = QUERIES[name](spark, sf_small)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = oracle_result(ORACLES[name], sf_small)
    assert sorted(s_cols) == sorted(
        c.lower() for c in o_cols
    ), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} != {len(o_rows)}"
    sr = _rowset(s_cols, s_rows)
    orr = _rowset([c.lower() for c in o_cols], o_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{sr[mismatches[0]]} != {orr[mismatches[0]]}"
    )
