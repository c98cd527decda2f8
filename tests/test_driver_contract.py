"""Replicates the round driver's correctness gate locally: every
``queries()`` entry with an ``oracle_sql()`` runs on Spark AND DuckDB
at sf0.001/sf0.01 and must match on row count, column names, and an
order-insensitive value hash.  Rows-only entries must run and return
a stable schema."""

from __future__ import annotations

import hashlib

import os

import duckdb
import pytest

from lacspark.queries import ORACLE_SQL, SPARK_QUERIES

SF_DIR = os.environ.get("LACSPARK_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


ORACLE_NAMES = sorted(ORACLE_SQL)
ROWS_ONLY = sorted(set(SPARK_QUERIES) - set(ORACLE_SQL))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = [c.lower() for c in sdf.columns]

    cur = duck.execute(ORACLE_SQL[name])
    d_cols = [c[0].lower() for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), \
        f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), \
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sh = value_hash(s_rows, s_cols)
    dh = value_hash(d_rows, d_cols)
    if sh != dh:
        s_set = set("\x01".join(map(_norm, r)) for r in s_rows)
        d_set = set("\x01".join(map(_norm, r)) for r in d_rows)
        diff = list(s_set ^ d_set)[:6]
        pytest.fail(f"{name}: value hash mismatch; sample diffs {diff}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0


def test_gate_ordering_covers_all_queries_within_two_rounds(monkeypatch):
    """The driver gate records only a prefix of the registry (50
    entries in rounds 2-3).  The ordering contract: flagships first,
    this round's fresh/changed queries right after (so the round that
    changes a query is the round that gates it), and the remaining
    tail rotated per round so any 50-entry window covers every query
    across two consecutive rounds."""
    import __spark_entry__ as se

    ordered = list(se._ordered(SPARK_QUERIES))
    assert ordered[:len(se._PRIORITY)] == se._PRIORITY
    folded = se._folded()
    fresh_present = [k for k in se._FRESH
                     if k in SPARK_QUERIES and k not in folded]
    n_p = len(se._PRIORITY)
    assert ordered[n_p:n_p + len(fresh_present)] == fresh_present

    # folded members never ride the gate directly — their suite does
    assert not folded & set(ordered)
    assert {"relational_suite", "docmeta_suite"} <= set(ordered)

    window = 50
    covered: set[str] = set()
    for rnd in (4, 5):
        monkeypatch.setattr(se, "_round_no", lambda r=rnd: r)
        covered |= set(list(se._ordered(SPARK_QUERIES))[:window])
    # a folded member counts as covered through its suite entry
    assert covered | folded == set(SPARK_QUERIES), \
        sorted(set(SPARK_QUERIES) - covered - folded)
