"""Edge-semantics pins for the round-12 keys, on synthetic fixtures.

Each test builds a tiny parquet fixture engineered to sit exactly on a
decision boundary and runs the REGISTERED key against its REGISTERED
oracle via tests/oracle.compare — the same end-to-end contract the
driver checks, so an engine/oracle divergence on the edge fails here
before a fixture ever exercises it.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from oracle import compare

from flume_hive_batch_sink_spark import registry
from flume_hive_batch_sink_spark.registry import load_all_operators

load_all_operators()

EVENTS_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")
DOCS_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_BASE_SF = "/root/testdata/sf0.001"


def _edge_dir(tmp_path) -> str:
    """A synthetic sf_dir: every fixture table symlinked from sf0.001
    (oracle.duckdb_connect binds ALL tables at connect time), with the
    table under test overwritten by the caller."""
    import os

    d = tmp_path / "sf_edge"
    d.mkdir(exist_ok=True)
    for f in os.listdir(_BASE_SF):
        if f.endswith(".parquet") and not (d / f).exists():
            os.symlink(os.path.join(_BASE_SF, f), d / f)
    return str(d)


def _write_table(tmp_path, name, cols, rows) -> str:
    import os

    import pandas as pd

    d = _edge_dir(tmp_path)
    target = os.path.join(d, f"{name}.parquet")
    if os.path.lexists(target):
        os.unlink(target)
    pdf = pd.DataFrame(rows, columns=list(cols))
    if "ts" in pdf.columns:
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(target, index=False)
    return d


def _write_events(spark, tmp_path, rows):
    return _write_table(tmp_path, "events", EVENTS_COLS, rows)


def _write_docs(spark, tmp_path, rows):
    return _write_table(tmp_path, "documents", DOCS_COLS, rows)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_session_window_gap_boundary(spark, tmp_path):
    """Spark merges an event at EXACTLY prev_ts + gap into the session
    (window merge is end-INCLUSIVE: next.start ≤ prev.end); only a
    strictly larger gap splits — which is why the oracle's island break
    is strict `>`. Written against observed Spark behavior: the first
    draft assumed end-exclusive ([start, last+gap)) and the oracle's
    `>=` break diverged on exactly-gap-spaced events. Also pins the
    watermark cutoff keeping trailing sessions unemitted."""
    rows = [
        # user 1: 6h00m gap EXACTLY → still ONE session (boundary merge)
        (1, _ts("2024-01-01T00:00:00"), 1, "view", 1.0, "{}"),
        (2, _ts("2024-01-01T06:00:00"), 1, "view", 2.0, "{}"),
        # user 2: 1µs under the gap → ONE session of both events
        (3, _ts("2024-01-01T00:00:00"), 2, "view", 3.0, "{}"),
        (4, _ts("2024-01-01T05:59:59.999999"), 2, "view", 4.0, "{}"),
        # user 4: 1µs OVER the gap → TWO sessions
        (8, _ts("2024-01-01T00:00:00"), 4, "view", 6.0, "{}"),
        (9, _ts("2024-01-01T06:00:00.000001"), 4, "view", 7.0, "{}"),
        # user 3: a session inside the final (gap + delay) horizon —
        # still OPEN at end-of-stream, must be emitted by NEITHER engine
        (5, _ts("2024-01-10T09:00:00"), 3, "view", 5.0, "{}"),
        # watermark driver: trailing events far past everything above
        (6, _ts("2024-01-10T10:00:00"), 9, "view", 0.0, "{}"),
        (7, _ts("2024-01-10T10:00:01"), 9, "view", 0.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    key = "stream_session_window"
    compare(registry.QUERIES[key](spark, d), registry.ORACLES[key], d)
    out = {
        (r.user_id, r.session_start): r.n_events
        for r in registry.QUERIES[key](spark, d).collect()
    }
    # boundary merges (users 1, 2), 1µs-over splits (user 4), open
    # session unemitted (user 3)
    assert out[(1, _ts("2024-01-01T00:00:00"))] == 2
    assert out[(2, _ts("2024-01-01T00:00:00"))] == 2
    assert out[(4, _ts("2024-01-01T00:00:00"))] == 1
    assert out[(4, _ts("2024-01-01T06:00:00.000001"))] == 1
    assert not any(u == 3 for (u, _s) in out)


def test_char_entropy_degenerate_docs(spark, tmp_path):
    """Single-character-alphabet and empty documents must yield entropy
    exactly 0 (and keep=false) in BOTH engines — split('') returns ['']
    for the empty string on both sides, so even the empty doc has a
    defined (zero) entropy rather than a NULL/dropped row."""
    rows = [
        (1, "aaaaaaaa", "en", "web", 8),
        (2, "", "en", "web", 0),
        (3, "the quick brown fox jumps", "en", "web", 25),
    ]
    d = _write_docs(spark, tmp_path, rows)
    key = "llm_char_entropy_filter"
    compare(registry.QUERIES[key](spark, d), registry.ORACLES[key], d)
    got = {r.doc_id: r for r in registry.QUERIES[key](spark, d).collect()}
    assert got[1].char_entropy == 0.0 and not got[1].keep
    assert got[2].char_entropy == 0.0 and not got[2].keep
    assert got[3].char_entropy > 1.0


def test_wimbd_short_docs_produce_no_trigrams(spark, tmp_path):
    """Documents with fewer than 3 words contribute nothing (the
    greatest(n−2, 0) slice clamp — an unguarded sequence(1, n-2) would
    DESCEND for n<3 and fabricate phantom trigrams, the bug the HOF
    rewrite also removed from llm_fingerprint/llm_repetition_score);
    3-word docs contribute exactly one."""
    rows = [
        (1, "one", "en", "web", 3),
        (2, "two words", "en", "web", 9),
        (3, "exactly three words", "en", "web", 19),
        (4, "exactly three words", "en", "web", 19),
    ]
    d = _write_docs(spark, tmp_path, rows)
    key = "llm_wimbd_topngrams"
    compare(registry.QUERIES[key](spark, d), registry.ORACLES[key], d)
    out = registry.QUERIES[key](spark, d).collect()
    assert len(out) == 1
    assert out[0].ngram == "exactly three words" and out[0].n == 2


def test_wilson_ci_extreme_groups(spark, tmp_path):
    """k=0 and k=n groups sit on the interval's closed-form boundary
    (p̂(1−p̂)=0): ci_lo must be exactly 0 for k=0 and ci_hi exactly
    z²/(n+z²)-complement for k=n — and, more importantly, both engines
    must produce the identical doubles."""
    rows = []
    for i in range(20):
        rows.append((i, _ts("2024-01-01T00:00:00"), 1, "never", 1.0, "{}"))
        rows.append((100 + i, _ts("2024-01-01T00:00:00"), 1, "always", 99.0, "{}"))
    rows.append((500, _ts("2024-01-01T00:00:00"), 1, "mixed", 99.0, "{}"))
    rows.append((501, _ts("2024-01-01T00:00:00"), 1, "mixed", 1.0, "{}"))
    d = _write_events(spark, tmp_path, rows)
    key = "agg_ratio_ci_wilson"
    compare(registry.QUERIES[key](spark, d), registry.ORACLES[key], d)
    got = {r.event_type: r for r in registry.QUERIES[key](spark, d).collect()}
    assert got["never"].rate == 0.0 and got["never"].ci_lo == 0.0
    assert got["always"].rate == 1.0 and got["always"].ci_hi == 1.0
    assert 0.0 < got["mixed"].ci_lo < 0.5 < got["mixed"].ci_hi < 1.0


@pytest.mark.parametrize("key", ["multimodal_mime_sniff"])
def test_mime_sniff_every_branch_populated(spark, key):
    """The fixture's doc_id cycle must hit all five magic signatures —
    a sniffing test that only ever sees one branch proves nothing."""
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
    mimes = {
        r.mime_type
        for r in registry.QUERIES[key](spark, sf).select("mime_type").distinct().collect()
    }
    assert mimes == {
        "image/jpeg",
        "image/png",
        "image/bmp",
        "application/x-riff",
        "video/webm",
    }
