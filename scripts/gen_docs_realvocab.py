#!/usr/bin/env python
"""Realistic-vocabulary documents variant for sf1 dedup-family headroom.

The driver fixture's documents draw from a 31-word vocabulary, which
makes random doc pairs genuinely similar: at sf0.01 the VERIFIED
Jaccard>=0.8 near-dup edge set is already ~25% of all pairs (30,328
pairs from 500 docs), so at 50k docs the TRUE near-dup graph is ~3x10^8
edges — quadratic in the data by construction, regardless of algorithm.
Real corpora are the opposite: near-dup mass comes from template
families and crawls, a vanishing fraction of all pairs. This generator
keeps the sf1 documents schema and dup-tail injection identical to
gen_sf.py but draws from a 10k-word synthetic vocabulary, so LSH
banding has something to prune — the regime the 100 TB design targets.

The output dir contains symlinks to the base sf1 tables plus the
replacement documents.parquet, usable directly as an sf_dir.

Usage: python scripts/gen_docs_realvocab.py [base_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "es", "zh", "de", "fr"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def main() -> None:
    base = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("testdata/sf1")
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("testdata/sf1rv")
    gen(base, out)


def gen(base: Path, out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    n_docs = pq.read_metadata(base / "documents.parquet").num_rows

    for f in base.glob("*.parquet"):
        if f.name == "documents.parquet":
            continue
        dst = out / f.name
        if not dst.exists():
            os.symlink(f.resolve(), dst)

    rng = np.random.default_rng(4242)
    # Uniform draw over 10k words: realistic corpora are head-heavy, but
    # a zipf head would put its top token in ~half of all docs and blow
    # up the ORACLE's all-pairs token self-join (the thing being made
    # tractable); uniform keeps per-token doc lists ~250 long (6e8 join
    # rows — DuckDB-tractable) while preserving the property under test,
    # that random pairs are dissimilar and LSH banding prunes.
    vocab = np.array([f"w{i:05d}" for i in range(10_000)])
    lens = rng.integers(8, 101, n_docs)
    words = rng.choice(vocab, int(lens.sum()))
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    # same dup-tail recipe as gen_sf.py: 0.3% exact, 1.5% near (1-token)
    for i in rng.choice(np.arange(n_docs // 10, n_docs), max(1, int(0.003 * n_docs)), replace=False):
        texts[i] = texts[int(rng.integers(0, n_docs // 10))]
    for i in rng.choice(np.arange(n_docs // 10, n_docs), max(1, int(0.015 * n_docs)), replace=False):
        toks = texts[int(rng.integers(0, n_docs // 10))].split()
        toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
        texts[i] = " ".join(toks)
    pq.write_table(pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_docs, p=LANG_P),
        "source": np.array([f"src{s}" for s in rng.integers(0, 20, n_docs)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    # 16k-row groups: Spark can't split a parquet file below row-group
    # granularity, and one 500k-row group serialized the dedup sweeps'
    # corpus map stages on a single core (round-12 finding; real
    # corpora arrive as many files)
    }), out / "documents.parquet", row_group_size=16 * 1024)
    print(f"wrote {n_docs:,} docs with uniform 10k-word vocab -> {out}")


if __name__ == "__main__":
    main()


def gen_scale(
    n_docs: int,
    out: Path,
    chunk: int = 500_000,
    vocab_size: int = 100_000,
) -> None:
    """Standalone documents-only fixture at arbitrary scale (round-13:
    the sf100rv probe needs 5M docs and no base sf100 exists). Streams
    CHUNKS through one ParquetWriter so peak memory is one chunk, not
    the corpus: same 10k-word uniform vocabulary, same 16k row groups,
    same dup-tail rates as gen() — exact/near duplicates copy from a
    HEAD POOL (the first chunk's first 10%), which matches real corpora
    (template families recur corpus-wide) and keeps the recipe
    single-pass. documents.parquet only: the dedup family loads nothing
    else.

    ``vocab_size`` defaults to 100k, NOT gen()'s 10k: the first sf100rv
    probe (round 13, SCALE.md) showed that a vocabulary FIXED while the
    corpus grows exhausts LSH band-key entropy — any token ranked low
    in both of a band's hash permutations buckets every doc containing
    it (~21k-doc buckets at 5M docs/10k vocab), and Σw² candidates
    filled the disk. Real corpora grow vocabulary with size (Heaps'
    law, V ∝ n^~0.5: 5M docs ⇒ ≥100k types even conservatively); gen()
    keeps 10k only because its scales carry a DuckDB all-pairs oracle
    whose token self-join needs short per-token doc lists. No oracle
    runs at probe scale, so the probe fixture uses the realistic
    entropy."""
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(424242)
    vocab = np.array([f"w{i:06d}" for i in range(vocab_size)])
    writer = None
    head_pool: list[str] = []
    head_n = max(1, chunk // 10)
    done = 0
    while done < n_docs:
        m = min(chunk, n_docs - done)
        lens = rng.integers(8, 101, m)
        words = rng.choice(vocab, int(lens.sum()))
        offs = np.concatenate(([0], np.cumsum(lens)))
        texts = [
            " ".join(words[offs[i]:offs[i + 1]]) for i in range(m)
        ]
        if not head_pool:
            head_pool = texts[:head_n]
        else:
            for i in rng.choice(m, max(1, int(0.003 * m)), replace=False):
                texts[i] = head_pool[int(rng.integers(0, len(head_pool)))]
            for i in rng.choice(m, max(1, int(0.015 * m)), replace=False):
                toks = head_pool[
                    int(rng.integers(0, len(head_pool)))
                ].split()
                toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
                texts[i] = " ".join(toks)
        tbl = pa.table({
            "doc_id": np.arange(done, done + m, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, m, p=LANG_P),
            "source": np.array(
                [f"src{s}" for s in rng.integers(0, 20, m)]
            ),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        })
        if writer is None:
            writer = pq.ParquetWriter(
                out / "documents.parquet", tbl.schema
            )
        writer.write_table(tbl, row_group_size=16 * 1024)
        done += m
        print(f"  {done:,}/{n_docs:,} docs", flush=True)
    if writer is not None:
        writer.close()
    print(
        f"wrote {n_docs:,} docs ({vocab_size:,}-word vocab, streamed)"
        f" -> {out}"
    )
