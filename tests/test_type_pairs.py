"""Lock every (Spark, DuckDB) type pair in the oracle whitelist as
stringification-safe through ALL THREE driver compare paths — str() on
collected rows, pandas conversion, and Arrow conversion (catalog rule 6,
plans/catalog.py docstring).

This is the unit-level companion to scripts/driver_rehearsal.py's triple
compare: each whitelisted pair gets a tiny synthetic column (including NULL
and, for double, NaN) materialized on both engines and stringified through
every path. The r1/r2 driver hash-fails were exactly a pair that was safe
under str() but not under pandas (DuckDB HUGEINT -> float64 "123.0"); this
test makes the whitelist's safety claim executable rather than a comment.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# (spark simpleString, spark type, duckdb type, values) — one row per
# whitelisted pair in tests/test_catalog_oracle.py::_TYPE_OK.
PAIRS = [
    ("bigint", LongType(), "BIGINT",
     [0, 1, -5, 9007199254740993, None]),  # incl. > 2^53 (float-unsafe)
    ("bigint", LongType(), "INTEGER",
     [0, 1, -5, 2147483647, None]),
    ("int", IntegerType(), "INTEGER",
     [0, 1, -5, 2147483647, None]),
    ("int", IntegerType(), "BIGINT",
     [0, 1, -5, 2147483647, None]),
    ("double", DoubleType(), "DOUBLE",
     [0.5, -1.25, 1e308, float("nan"), None]),
    ("string", StringType(), "VARCHAR",
     ["a", "", "Ünicode", "with,comma", None]),
]


def _sql_literal(v, duck_type):
    if v is None:
        return f"CAST(NULL AS {duck_type})"
    if isinstance(v, float):
        if v != v:
            return f"CAST('NaN' AS {duck_type})"
        return f"CAST({v!r} AS {duck_type})"
    if isinstance(v, str):
        return "CAST('" + v.replace("'", "''") + f"' AS {duck_type})"
    return f"CAST({v} AS {duck_type})"


@pytest.mark.parametrize(
    "simple,stype,dtype,values", PAIRS, ids=[f"{p[0]}-{p[2]}" for p in PAIRS]
)
def test_type_pair_three_path_safe(spark, duck, simple, stype, dtype, values):
    schema = StructType([StructField("v", stype, True)])
    sdf = spark.createDataFrame([(v,) for v in values], schema)
    assert sdf.schema.fields[0].dataType.simpleString() == simple

    sql = " UNION ALL ".join(
        f"SELECT {_sql_literal(v, dtype)} AS v" for v in values
    )

    # Path 1: str() over collected rows (driver fetchall-style).
    s1 = sorted(str(r.v) for r in sdf.collect())
    d1 = sorted(str(r[0]) for r in duck.sql(sql).fetchall())
    assert s1 == d1, f"str() path: {s1} vs {d1}"

    # Path 2: pandas conversion.
    s2 = sorted(str(v) for v in sdf.toPandas()["v"])
    d2 = sorted(str(v) for v in duck.sql(sql).df()["v"])
    assert s2 == d2, f"pandas path: {s2} vs {d2}"

    # Path 3: Arrow conversion.
    s3 = sorted(str(v) for v in sdf.toArrow().column("v").to_pylist())
    d3 = sorted(str(v) for v in duck.sql(sql).arrow().column("v").to_pylist())
    assert s3 == d3, f"arrow path: {s3} vs {d3}"
