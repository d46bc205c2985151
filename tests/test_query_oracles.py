"""Local replica of the driver's DuckDB-oracle correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at sf0.001, compare
row-count, schema width, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.4f}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _pairs():
    from otar3088_spark.oracles_sql import ORACLE_SQL
    from otar3088_spark.queries import QUERIES

    return sorted(set(QUERIES) & set(ORACLE_SQL))


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_duckdb(spark, name):
    from otar3088_spark.oracles_sql import ORACLE_SQL
    from otar3088_spark.queries import QUERIES

    sdf = QUERIES[name](spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = _duck()
    res = con.execute(ORACLE_SQL[name])
    dcols = sorted(d[0] for d in res.description)
    drows = _norm_rows([d[0] for d in res.description], res.fetchall())
    con.close()

    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    mism = [(a, b) for a, b in zip(srows, drows) if a != b][:5]
    assert srows == drows, f"{name}: first diffs {mism}"


def test_every_query_has_oracle_or_is_flagged():
    from otar3088_spark.oracles_sql import ORACLE_SQL
    from otar3088_spark.queries import QUERIES

    missing = set(ORACLE_SQL) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"
