"""Static type sweep over every registered oracle.

The r10 gate lost a row to DuckDB typing: SUM(BIGINT) is HUGEINT, pandas
renders HUGEINT as float64, and the driver's value hash then disagrees with
Spark's int64 even when every value matches (VERDICT r10, pipe_dataset_card).
HUGEINT can never appear in an oracle's OUTPUT schema — internal CTE
arithmetic may widen freely, but the final SELECT must CAST back down.

``DESCRIBE (<sql>)`` plans the query without executing it, so this sweep is
cheap enough to run in the default suite against the sf0.001 views.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_hugeint(con):
    from distributed_graph_database_simulation_spark.registry import oracle_sql

    offenders = {}
    for name, sql in oracle_sql().items():
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if any(b in typ.upper() for b in BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting HUGEINT output columns (driver hashes these as "
        f"float64 and the row goes red): {offenders}"
    )
