"""Driver-contract invariants: every oracle has a query, every query is
callable, SQL strings are well-formed DuckDB (parse-checked without
execution against real tables where cheap)."""

import duckdb

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    q, o = entry.queries(), entry.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"
    assert len(q) >= 25
    assert len(o) >= 20


def test_all_queries_callable():
    assert all(callable(f) for f in entry.queries().values())


def test_oracle_sql_parses_and_runs_on_tiny():
    """Every oracle must actually execute in DuckDB (sf0.001 views)."""
    con = duckdb.connect()
    from peregrine_spark.sources.testdata import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, sql in entry.oracle_sql().items():
        con.execute(sql).fetchall()  # raises on malformed SQL
