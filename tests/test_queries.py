"""Driver-style correctness gate, run locally: every oracle-backed query in
__spark_entry__ must match DuckDB on row count and order-insensitive values
(columns sorted by name, like the driver's compare); rows-only queries must
run and return a stable schema."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# default sf0.001 keeps the suite fast; set DISCO_TEST_SF=/root/testdata/sf0.01
# to mirror the driver's gate scale exactly
SF_DIR = os.environ.get("DISCO_TEST_SF", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value canonicalization: fixed decimal repr
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return str(v)
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(entry_mod.oracle_sql())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    if sset != dset:
        diff = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"{name} value mismatch, e.g. {diff}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns  # stable schema
    # deterministic across runs
    rows2 = entry_mod.queries()[name](spark, SF_DIR).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"source", "n_docs", "avg_quality", "avg_tokens"}
