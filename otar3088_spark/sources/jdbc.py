"""JDBC ingest shim — S8 (SQLite/ChEMBL) and S9 (Postgres/AACT) sources.

The reference opens DB connections per query (chembl_sql_utils.py:88-114
sqlite3, trial_to_paper_utils.py:11-24 psycopg2) and iterates cursors in
Python. Spark-first, both become ``spark.read.jdbc`` with:

* predicate/column pushdown — pass ``query`` (server-side projection +
  filter) or let Catalyst push filters into the scan;
* partitioned parallel reads — ``partition_column/lower/upper/num_partitions``
  splits the table into concurrent range scans (the reference reads are
  single-cursor serial);
* fetchsize tuned for bulk extraction.

This sandbox has no JDBC driver jars or reachable databases, so the module
is a thin, fully-tested option builder plus a one-line ``.load()`` — the
semantics the reference's SQL encodes are exercised against parquet in the
oracle battery (multiway_join, right_join_dedup, dedup_first_wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SQLITE_URL = "jdbc:sqlite:{path}"  # S8 (ChEMBL dump)
POSTGRES_URL = "jdbc:postgresql://{host}:{port}/{db}"  # S9 (AACT)


def jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    driver: str | None = None,
    **properties: str,
) -> dict[str, str]:
    """Validated option map for ``spark.read.format('jdbc')``.

    Exactly one of ``table``/``query``; partitioned reads need all four
    partition options (Spark's own contract, surfaced early and typed)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query  # type: ignore[assignment]
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part):
        if any(p is None for p in part):
            raise ValueError(
                "partitioned read needs partition_column, lower_bound, "
                "upper_bound and num_partitions together"
            )
        if query is not None:
            raise ValueError("partition_column requires table=, not query=")
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    if driver:
        opts["driver"] = driver
    opts.update({k: str(v) for k, v in properties.items()})
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """``spark.read.format('jdbc').options(**jdbc_options(...)).load()``."""
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()
