"""Static dtype sweep over every SQL oracle (r4 verdict item 2).

The only two red driver rows in round 4 (``bpe_train``,
``mix_sources``) were value-correct: DuckDB widens ``SUM(BIGINT)`` to
HUGEINT, pandas surfaces HUGEINT as float64, and the driver's
value hash then mismatches Spark's int64 even though every value is
equal. This sweep ``DESCRIBE``s each oracle against the sf0.001
tables and fails if any output column is HUGEINT/UHUGEINT, so a raw
``SUM``/``COUNT`` widening can never reach the driver again.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
os.environ["TEST_SF_DIR"] = SF_DIR
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle_items():
    return sorted(entry_mod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_exposes_no_hugeint(con, name, sql):
    """DESCRIBE is static (no rows scanned): the oracle's declared
    output types must never include DuckDB's 128-bit integers, which
    pandas cannot hold as int64 and the driver hash cannot match."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc
           if "HUGEINT" in str(typ).upper()]
    assert not bad, (
        f"oracle {name!r} exposes 128-bit integer columns {bad}; "
        f"wrap the aggregate in CAST(... AS BIGINT)")
