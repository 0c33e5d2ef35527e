"""Every registry entry with an oracle must match DuckDB on sf0.01 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from union_indexer_node_spark import queries as q

from conftest import SF_ORACLE_DIR
from oracle_harness import compare, duckdb_conn

REG = q.registry()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_ORACLE_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REG))
def test_oracle_match(spark, duck, name):
    qd = REG[name]
    sdf = qd.fn(spark, SF_ORACLE_DIR).toPandas()
    if qd.oracle is None:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = duck.execute(qd.oracle).df()
    errs = compare(sdf, ddf, name)
    assert not errs, "\n".join(errs)
