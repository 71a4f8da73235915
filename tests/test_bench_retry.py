"""bench.py contended-retry protocol (round-14, VERDICT r13 item 6):
when the first full bench run self-flags ``contended``, the entrypoint
re-runs the protocol once and publishes the steady-state run with the
contended run's summary attached — so the judged artifact carries its
own provenance instead of needing a separate idle-host rerun. Stubbed:
this pins the DECISION LOGIC, not Spark timings."""

from __future__ import annotations

import contextlib
import io
import json

import bench


def _run_main(monkeypatch, results, stops=None):
    it = iter(results)
    monkeypatch.setattr(bench, "run_spark_bench", lambda sf_dir: next(it))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    if stops is not None:
        monkeypatch.setattr(
            bench, "_stop_spark_for_cold_retry", lambda: stops.append(1)
        )
    else:
        monkeypatch.setattr(bench, "_stop_spark_for_cold_retry", lambda: None)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    return json.loads(buf.getvalue())


def _res(value, contended):
    return {
        "metric": "headline_queries_total_warm",
        "value": value,
        "queries": {"q1": value},
        "contended": contended,
        "loadavg_1m": {"initial": 5.0, "before": 3.0, "after": 1.0},
    }


def test_uncontended_run_publishes_directly(monkeypatch):
    out = _run_main(monkeypatch, [_res(0.3, False)])
    assert out["value"] == 0.3
    assert "contended_first_run" not in out and "contended_retry" not in out


def test_contended_first_run_retries_and_publishes_steady_state(monkeypatch):
    stops = []
    out = _run_main(monkeypatch, [_res(0.5, True), _res(0.3, False)], stops=stops)
    assert out["value"] == 0.3 and out["contended"] is False
    assert out["contended_first_run"]["value"] == 0.5
    assert out["contended_first_run"]["contended"] is True
    # cold like-for-like (ADVICE r14): the first run's session is
    # stopped before the retry so the retry pays warmup too
    assert stops == [1]


def test_both_contended_publishes_first_run_no_value_selection(monkeypatch):
    # ADVICE r14: when both runs are contended, publish the FIRST run
    # regardless of which measured faster — selecting min-of-two under
    # contention is a cherry-picking bias. Retry FASTER than first:
    out = _run_main(monkeypatch, [_res(0.9, True), _res(0.4, True)])
    assert out["value"] == 0.9 and out["contended"] is True
    assert out["contended_retry"]["value"] == 0.4
    # and retry slower than first:
    out = _run_main(monkeypatch, [_res(0.4, True), _res(0.9, True)])
    assert out["value"] == 0.4 and out["contended"] is True
    assert out["contended_retry"]["value"] == 0.9


def test_uncontended_retry_published_even_if_slower(monkeypatch):
    # selection is by contention state only — an uncontended retry is
    # the steady-state measurement even when it's numerically slower
    out = _run_main(monkeypatch, [_res(0.3, True), _res(0.5, False)])
    assert out["value"] == 0.5 and out["contended"] is False
    assert out["contended_first_run"]["value"] == 0.3


def test_import_bench_does_not_set_cache_inputs(monkeypatch):
    # VERDICT r14 #1: importing bench must NOT flip io.load into cache
    # mode — only the entrypoints may. The module was already imported
    # at file top; assert the env var is whatever conftest pinned (0),
    # then check main() uses setdefault (respects an existing pin).
    import os

    assert os.environ.get("SPARK_GRAFT_CACHE_INPUTS") == "0"
    _run_main(monkeypatch, [_res(0.3, False)])
    assert os.environ.get("SPARK_GRAFT_CACHE_INPUTS") == "0"


def test_retry_disabled_by_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CONTENDED_RETRY", "0")
    out = _run_main(monkeypatch, [_res(0.5, True)])
    assert out["value"] == 0.5 and out["contended"] is True
    assert "contended_first_run" not in out


def test_input_cache_survives_session_restart(tmp_path):
    """Round-15: the contended cold-retry stops the SparkSession and
    re-runs the protocol; io's input cache must not hand the retry
    DataFrames bound to the DEAD context (observed as a bench process
    dying with "'NoneType' object has no attribute 'setCallSite'" and
    publishing an empty artifact). Subprocess because the shared
    session fixture cannot be stopped mid-suite."""
    import subprocess
    import sys as _sys
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = tmp_path / "restart_probe.py"
    script.write_text(
        "import sys, os\n"
        f"sys.path.insert(0, {repo!r})\n"
        "os.environ['SPARK_GRAFT_CACHE_INPUTS'] = '1'\n"
        "from flume_hive_batch_sink_spark import io\n"
        "from flume_hive_batch_sink_spark.session import get_spark\n"
        "s1 = get_spark('restart_a')\n"
        "n1 = io.load(s1, '/root/testdata/sf0.01', 'lineitem').count()\n"
        "s1.stop()\n"
        "s2 = get_spark('restart_b')\n"
        "n2 = io.load(s2, '/root/testdata/sf0.01', 'lineitem').count()\n"
        "assert n1 == n2 > 0, (n1, n2)\n"
        "print('RESTART_OK')\n"
    )
    env = dict(_os.environ)
    env.pop("SPARK_GRAFT_CACHE_INPUTS", None)
    out = subprocess.run(
        [_sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RESTART_OK" in out.stdout
