"""Driver-contract replica: every registered key runs at the t2 scale
factor and hash-matches its DuckDB oracle (rows-only keys must at least
execute and return a stable row count > 0)."""

from __future__ import annotations

import os

import pytest

from oracle import compare

from flume_hive_batch_sink_spark import registry
from flume_hive_batch_sink_spark.registry import load_all_operators

load_all_operators()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


@pytest.mark.parametrize("key", sorted(registry.QUERIES))
def test_oracle_parity(spark, key):
    df = registry.QUERIES[key](spark, SF_DIR)
    if key in registry.ORACLES:
        compare(df, registry.ORACLES[key], SF_DIR)
    else:
        assert df.count() > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"dt", "hr", "event_type", "n_events", "sum_value"}
