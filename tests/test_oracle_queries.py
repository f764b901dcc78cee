"""Driver-style oracle checks: each SQL-expressible query must match
DuckDB on the same parquet tables (row count + column names + values),
mimicking the driver's CORRECTNESS gate at sf0.01 (run here at sf0.001
for speed; dtypes and semantics are identical)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
# corpus-backed oracles (caption_resolution, redact_spans) read the
# sf-specific corpus parquet - pin the oracle sf to the test sf
os.environ["TEST_SF_DIR"] = SF_DIR
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    try:
        import pandas as pd
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
    except Exception:
        pass
    return v


def _normalize(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return cols, rows


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    ddf = _duck(entry_mod.oracle_sql()[name])
    scols, srows = _normalize(sdf)
    dcols, drows = _normalize(ddf)
    assert scols == dcols
    assert len(srows) == len(drows)
    assert srows == drows


HEAD_LEN = 27  # r5: 25 engine rows + promoted mix_sources/bpe_train
WINDOW = 50    # the driver row-checks only this many registry entries


def test_registry_rotation_covers_all_queries(monkeypatch):
    """ADVICE r3 item 4: the driver checks only the first 50 registry
    entries; the rotation must (a) keep the pinned head pinned,
    (b) permute, never add/drop, and (c) have the even+odd windows
    jointly cover every registered query - which requires the pool to
    be EXACTLY twice the per-round pool window."""
    from docling_core_spark import queries as qmod

    monkeypatch.setattr(qmod, "_rotation_state", lambda: 0)
    even = list(qmod.registry())
    monkeypatch.setattr(qmod, "_rotation_state", lambda: 1)
    odd = list(qmod.registry())
    assert sorted(even) == sorted(odd)
    assert even[:HEAD_LEN] == odd[:HEAD_LEN]
    assert len(even) - HEAD_LEN == 2 * (WINDOW - HEAD_LEN), (
        "pool must be exactly 2x the per-round pool window for an "
        "exact two-round cover")
    assert set(even[:WINDOW]) | set(odd[:WINDOW]) == set(even)
    assert even != odd


def test_rotation_window_covers_prev_round_gap():
    """VERDICT r4 item 6: retirements/re-orders must never orphan a
    query for two consecutive driver windows (the pdf_cells_in_bbox
    drift). Load the committed CORRECTNESS_r{N-1}.json and assert
    every CURRENT registry entry is covered by (prev round's checked
    keys) UNION (this round's actual window)."""
    import glob
    import json

    from docling_core_spark import queries as qmod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not arts:
        pytest.skip("no committed CORRECTNESS artifact")
    prev = set(json.load(open(arts[-1])))
    # this round's window at the REAL rotation state (keyed on the
    # committed artifact count, exactly as the driver will see it)
    window = set(list(qmod.registry())[:WINDOW])
    orphaned = set(qmod.registry()) - (prev | window)
    assert not orphaned, (
        f"{sorted(orphaned)} were not driver-checked last round and "
        f"are outside this round's window - re-order or re-pin them")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert {"doc_id", "chunk_idx", "text", "headings",
            "span_refs"} <= set(df.columns)
    assert df.count() > 0
    assert rows
