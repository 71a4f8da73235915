#!/usr/bin/env python
"""Regenerate README.md's driver-vs-local verification coverage map.

The driver's CORRECTNESS_r*.json samples ~50 of the registered keys per
round; the rest are covered by the local full sweeps the artifacts
record. This script makes that split auditable at a glance: per key
family, how many keys each driver round sampled (all green or not) and
which local artifact covers the remainder. Rewrites the block between
the coverage-map markers in README.md; run it whenever keys or
artifacts change:

    python scripts/gen_coverage_map.py
"""

from __future__ import annotations

import datetime as dt
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

START = "<!-- coverage-map:start -->"
END = "<!-- coverage-map:end -->"

# Family = longest matching prefix (falls back to first token).
FAMILIES = [
    "pipeline_tpch", "pipeline", "stream", "sketch", "sample", "scan",
    "ingest", "graph", "multimodal", "llm", "agg", "join", "win", "dq",
    "etl", "ts", "fn", "geo", "hive", "dedup", "topk", "serialize",
    "partition", "batch", "file", "done", "idle",
]


def family(key: str) -> str:
    for f in FAMILIES:
        if key == f or key.startswith(f + "_"):
            return f
    return key.split("_")[0]


def load_driver_rounds() -> dict[str, dict[str, bool]]:
    """round tag -> {key: all-green}."""
    rounds = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        tag = f.stem.split("_")[-1]
        d = json.loads(f.read_text())
        rounds[tag] = {
            k: bool(
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match", True)
            )
            for k, v in d.items()
        }
    return rounds


def parse_sweep(log: Path) -> dict[str, str]:
    """key -> OK/ROWS/FAIL from a check_parity.py log (CR-tolerant)."""
    out: dict[str, str] = {}
    txt = log.read_text(errors="replace")
    for m in re.finditer(r"(OK|ROWS\(\d+\)|FAIL)\s+([a-z0-9_]+)\s+[\d.]+s", txt):
        out[m.group(2)] = m.group(1)
    return out


def main() -> None:
    from flume_hive_batch_sink_spark import registry
    from flume_hive_batch_sink_spark.registry import load_all_operators

    load_all_operators()
    keys = sorted(registry.QUERIES)
    rounds = load_driver_rounds()
    ever_driver = set().union(*[set(r) for r in rounds.values()]) & set(keys)
    # a key's verdict = its LATEST driver appearance (rounds sort by tag
    # zero-padded, so r02 < r10 works); the headline claim is computed,
    # never asserted
    latest_verdict: dict[str, bool] = {}
    for tag in sorted(rounds, key=lambda t: (len(t), t)):
        latest_verdict.update(rounds[tag])
    driver_red = sorted(
        k for k in ever_driver if not latest_verdict.get(k, False)
    )

    # newest full local sweep at each scale — by round number parsed
    # from the name (lexicographic order puts round10 before round7;
    # mtime is nondeterministic after a fresh clone), mtime as the
    # tiebreak for un-numbered names
    def sweep_order(p: Path) -> tuple[int, float]:
        m = re.search(r"round(\d+)", p.name)
        return (int(m.group(1)) if m else -1, p.stat().st_mtime)

    sweeps = {}
    for pattern, scale in (
        ("*full_parity_sf001*.log", "sf0.01"),
        ("*full_parity_sf1.log", "sf1"),
    ):
        logs = sorted(REPO.glob(f"artifacts/{pattern}"), key=sweep_order)
        if logs:
            sweeps[scale] = (logs[-1], parse_sweep(logs[-1]))

    fams = defaultdict(list)
    for k in keys:
        fams[family(k)].append(k)

    lines = [
        START,
        "",
        "### Verification coverage map (generated — "
        f"`python scripts/gen_coverage_map.py`, {dt.date.today()})",
        "",
        f"{len(keys)} registered keys. The driver samples ~50 keys per "
        f"round; union ever driver-checked: **{len(ever_driver)}** "
        + (
            "(all green in their latest appearance)"
            if not driver_red
            else f"(**{len(driver_red)} RED in their latest appearance: "
            f"{', '.join(driver_red)}**)"
        )
        + f". The remaining "
        f"{len(keys) - len(ever_driver)} are continuously verified by "
        "the local full sweeps below (same protocol: row count + schema "
        "+ order-insensitive value-hash vs DuckDB).",
        "",
    ]
    for scale, (log, res) in sweeps.items():
        n_ok = sum(1 for v in res.values() if v == "OK")
        n_fail = sum(1 for v in res.values() if v == "FAIL")
        # no mtime here: it is nondeterministic after a fresh clone;
        # the round-numbered filename carries the provenance
        lines.append(
            f"- Latest full local sweep at {scale}: "
            f"`{log.relative_to(REPO)}` — {n_ok} oracle-pass, "
            f"{n_fail} fail, {len(res)} keys."
        )
    lines += [
        "",
        "| family | keys | driver-sampled (round: n) | never-driver-sampled, covered by |",
        "| --- | --- | --- | --- |",
    ]
    for fam in sorted(fams):
        ks = fams[fam]
        per_round = []
        for tag, r in rounds.items():
            n = sum(1 for k in ks if k in r)
            if n:
                bad = [k for k in ks if k in r and not r[k]]
                per_round.append(f"{tag}: {n}" + (f" ({len(bad)} FAIL)" if bad else ""))
        never = [k for k in ks if k not in ever_driver]
        cover = []
        for scale, (_log, res) in sweeps.items():
            n_cov = sum(1 for k in never if res.get(k) == "OK")
            if never:
                cover.append(f"{scale}: {n_cov}/{len(never)}")
        lines.append(
            f"| `{fam}` | {len(ks)} | {', '.join(per_round) or '—'} | "
            f"{', '.join(cover) or '—'} |"
        )
    lines += ["", END]

    readme = (REPO / "README.md").read_text()
    block = "\n".join(lines)
    if START in readme:
        readme = re.sub(
            re.escape(START) + r".*?" + re.escape(END), block, readme, flags=re.S
        )
    else:
        # first insertion: directly under the Verification heading
        readme = readme.replace(
            "## Verification\n", "## Verification\n\n" + block + "\n\n", 1
        )
    (REPO / "README.md").write_text(readme)
    print(f"coverage map regenerated: {len(keys)} keys, "
          f"{len(ever_driver)} ever driver-checked, {len(sweeps)} sweeps")


if __name__ == "__main__":
    main()
