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

# Slow tier (round-16): full 327-key oracle-parity sweep (~9 min): the driver runs its own rotating oracle gate each round and scripts/check_parity.py replicates this sweep on demand. Deselected by the default run
# (pytest.ini addopts); the committed round gate runs -m "".
pytestmark = pytest.mark.slow

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


# Keys whose oracle may legitimately return 0 rows at the gate scale.
# EMPTY ON PURPOSE: a key goes here only when emptiness IS its
# semantics (none today). A 0-row oracle anywhere else means 0 = 0
# vacuous parity — the operator's logic is never attested on a real
# row, the failure class the round-8 verdict caught in
# pipeline_tpch_q9 (digit LIKE on digit-free p_names), set_except,
# pipeline_tpch_q20, pipeline_tpch_q22, join_anti and
# join_spatial_grid (all since re-based on fixture-nonempty grains).
VACUITY_EXEMPT: frozenset[str] = frozenset()


def test_no_oracle_is_vacuous_at_gate_scale():
    """Registry-wide anti-vacuity gate: every SQL oracle must select at
    least one row at the driver's gate scale (sf0.01). Runs DuckDB
    only — cheap (<1 min for all 300) — because the parity test above
    already proves Spark agrees with the oracle; this proves the
    agreement is about something."""
    from oracle import duckdb_connect

    con = duckdb_connect(SF_DIR)
    vacuous = sorted(
        key
        for key, sql in registry.ORACLES.items()
        if key not in VACUITY_EXEMPT
        and con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0] == 0
    )
    assert not vacuous, (
        f"oracle returns 0 rows at {SF_DIR} for {vacuous}: parity for "
        "these keys is vacuous (0 = 0). Re-base the query on a grain "
        "that is nonempty in the fixture, or — only if emptiness is "
        "the key's documented point — add it to VACUITY_EXEMPT."
    )


def test_driver_sample_rotation_stalest_first():
    """queries()/oracle_sql() must order keys by the round of their
    LATEST committed driver attestation ascending (never-checked = 0
    first; round-14 contract — each driver round re-attests the 50
    stalest keys), keep the two dicts aligned, and lose no keys
    relative to the registry."""
    import json
    import pathlib
    import re

    import __spark_entry__ as e

    qs = list(e.queries())
    assert set(qs) == set(registry.QUERIES)
    assert list(e.oracle_sql()) == [k for k in qs if k in registry.ORACLES]
    last: dict[str, int] = {}
    repo = pathlib.Path(e.__file__).resolve().parent
    for f in repo.glob("CORRECTNESS_r*.json"):
        # mirror the production fallback (ADVICE r14): a digitless
        # suffix (CORRECTNESS_rX.json) means round 0, not a crash
        m = re.search(r"_r(\d+)", f.name)
        rnd = int(m.group(1)) if m else 0
        doc = json.loads(f.read_text())
        if isinstance(doc, dict):
            for k in doc:
                last[k] = max(last.get(k, 0), rnd)
    rounds = [last.get(k, 0) for k in qs]
    assert rounds == sorted(rounds), (
        "a fresher-attested key sorts before a staler one"
    )


def test_skew_audit_empty_input_matches_oracle(spark, tmp_path):
    """Degenerate-input parity (round-9 ADVICE): on an EMPTY events
    table dq_skew_audit must still emit exactly one all-NULL row, like
    its oracle's windowed aggregate — the earlier crossJoin against an
    empty p99 relation silently dropped the totals row (0 rows vs 1)."""
    import duckdb

    from flume_hive_batch_sink_spark.io import load

    src = load(spark, SF_DIR, "events")
    empty_dir = str(tmp_path / "sfempty")
    src.limit(0).write.parquet(f"{empty_dir}/events.parquet")

    rows = registry.QUERIES["dq_skew_audit"](spark, empty_dir).collect()
    assert len(rows) == 1 and all(v is None for v in rows[0])

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{empty_dir}/events.parquet/*.parquet')"
        )
        oracle_rows = con.execute(registry.ORACLES["dq_skew_audit"]).fetchall()
    finally:
        con.close()
    assert len(oracle_rows) == 1 and all(v is None for v in oracle_rows[0])
