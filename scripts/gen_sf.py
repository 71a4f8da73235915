#!/usr/bin/env python
"""Deterministic fixture generator for scale factors above the driver's.

The driver ships read-only testdata at sf0.001/0.01/0.1
(`TESTDATA.md`); the 100 TB posture claims need at least one more
order of magnitude of *measured* headroom (VERDICT r2, task 1). This
script emits the same ten tables with identical arrow schemas
(`FIXTURES.md`) at any sf, seeded, so parity (Spark vs DuckDB on the
SAME parquet) and bench runs are meaningful at sf1+.

Distributions mirror the driver fixture (probed via DuckDB on sf0.1):
  - supplier/customer/part/orders scale linearly; region+nation are
    copied verbatim from the sf0.1 fixture (fixed dimension tables).
  - lineitem: 1+Poisson(3) lines per order (matches the observed
    1..17 fan-out, mean 4.0), shipdate = orderdate + U[1,95] days.
  - events: monotone ts over 30 days (exponential inter-arrival),
    TIMESTAMP(NANOS) physical type, value ~ Exp(mean 50) rounded.
  - documents: word soup over the sf0.1 31-word vocab with a small
    exact-dup (~0.3%) and near-dup (~1.5%) tail for the dedup family.
  - embeddings: unit-norm N(0,1)/||.|| float32[64] with ~5% near-dup
    copies (cos > 0.999) — the driver fixture has no label-cluster
    structure (within/across label mean cosine both ~0) but does have
    a dup tail, which llm_embed_dup / sim_topk rely on.

Usage: python scripts/gen_sf.py [sf] [out_dir]
Defaults: sf=1 → /root/repo/testdata/sf1 (gitignored; ~700 MB).

Row groups are capped at 512k rows (unlike the single-row-group
driver files) so both Spark and DuckDB can parallelize the scan —
at sf1 a single 6M-row group would serialize the lineitem scan.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DRIVER_SF01 = Path("/root/testdata/sf0.1")
ROW_GROUP = 512 * 1024

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDERSTATUS = ["O", "F", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUS = ["O", "F"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNAME_ADJ = ["large", "small", "hot", "cold", "blue", "red", "old", "new"]
PNAME_NOUN = ["ring", "bolt", "plate", "gear", "screw", "wheel", "pin", "rod"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "es", "zh", "de", "fr"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

EPOCH_DAY_MS = 86_400_000
ORDERDATE_LO = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
ORDERDATE_DAYS = 2404  # 1995-01-01 .. 2001-08-01, as in the driver fixture
EVENTS_T0_NS = np.datetime64("2024-01-01T00:00:00").astype("datetime64[ns]").astype(np.int64)
EVENTS_SPAN_S = 30 * 86_400  # events span ~30 days at every sf


def _write(out: Path, name: str, table: pa.Table) -> None:
    # documents/embeddings: cap row groups so CORPUS map stages can
    # parallelize too. 500k docs at sf10 fit under the 512k cap in ONE
    # row group, and Spark cannot split a parquet file below row-group
    # granularity — the round-12 dedup sweeps ran their scan→shingle→
    # partial-agg map side on 1 of 32 cores. Real corpora arrive as
    # many files; 16k-row groups emulate that (32 groups at sf10).
    rg = 16 * 1024 if name in ("documents", "embeddings") else ROW_GROUP
    pq.write_table(table, out / f"{name}.parquet", row_group_size=rg)
    print(f"  {name:10s} {table.num_rows:>9,} rows", flush=True)


def _round2(a: np.ndarray) -> np.ndarray:
    return np.round(a, 2)


def gen(sf: float, out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    n_supp = int(10_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))  # driver floors these at 500
    n_vec = max(500, int(20_000 * sf))

    # Fixed dims: copy verbatim so r_name/n_name filters match the
    # driver fixture at every sf.
    for t in ("region", "nation"):
        shutil.copyfile(DRIVER_SF01 / f"{t}.parquet", out / f"{t}.parquet")
        print(f"  {t:10s} copied from sf0.1", flush=True)

    rng = np.random.default_rng(42)

    sk = np.arange(n_supp, dtype=np.int64)
    _write(out, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": np.array([f"Supplier#{i:09d}" for i in sk]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": _round2(rng.uniform(-1000, 10_000, n_supp)),
    }))

    ck = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer", pa.table({
        "c_custkey": ck,
        "c_name": np.array([f"Customer#{i:09d}" for i in ck]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": _round2(rng.uniform(-1000, 10_000, n_cust)),
        "c_mktsegment": rng.choice(MKTSEGMENTS, n_cust),
    }))

    pk = np.arange(n_part, dtype=np.int64)
    adj = rng.choice(PNAME_ADJ, n_part)
    noun = rng.choice(PNAME_NOUN, n_part)
    _write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": _round2(900.0 + (pk % 1000) / 10.0),
    }))

    ok = np.arange(n_ord, dtype=np.int64)
    odate_ms = ORDERDATE_LO + rng.integers(0, ORDERDATE_DAYS + 1, n_ord) * EPOCH_DAY_MS
    _write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(ORDERSTATUS, n_ord),
        "o_totalprice": _round2(rng.uniform(1000, 500_000, n_ord)),
        "o_orderdate": odate_ms.astype("datetime64[ms]"),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }))

    nlines = 1 + rng.poisson(3.0, n_ord)
    li_order = np.repeat(ok, nlines)
    li_odate = np.repeat(odate_ms, nlines)
    n_li = int(li_order.size)
    linenumber = (np.arange(n_li, dtype=np.int64)
                  - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1)
    _write(out, "lineitem", pa.table({
        "l_orderkey": li_order,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": linenumber.astype(np.int32),
        "l_quantity": np.floor(rng.uniform(1, 51, n_li)),
        "l_extendedprice": _round2(rng.uniform(900, 105_000, n_li)),
        "l_discount": _round2(rng.integers(0, 11, n_li) / 100.0),
        "l_tax": _round2(rng.integers(0, 9, n_li) / 100.0),
        "l_returnflag": rng.choice(RETURNFLAGS, n_li),
        "l_linestatus": rng.choice(LINESTATUS, n_li),
        "l_shipdate": (li_odate + rng.integers(1, 96, n_li) * EPOCH_DAY_MS
                       ).astype("datetime64[ms]"),
    }))

    # events: monotone nanosecond timestamps (exponential inter-arrival
    # normalized to the 30-day span), TIMESTAMP(NANOS) physical type to
    # exercise the nanosAsLong read path exactly like the driver files.
    gaps = rng.exponential(1.0, n_evt)
    ts_ns = EVENTS_T0_NS + np.floor(
        np.cumsum(gaps) / gaps.sum() * EVENTS_SPAN_S * 1e9
    ).astype(np.int64)
    _write(out, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ts_ns.astype("datetime64[ns]"),
        "user_id": rng.integers(0, max(1, int(15_000 * sf)), n_evt).astype(np.int64),
        "event_type": rng.choice(EVENT_TYPES, n_evt),
        "value": _round2(rng.exponential(50.0, n_evt)),
        "props": np.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: same 31-word vocab as the driver fixture so token/tfidf
    # distributions are comparable; exact-dup + near-dup tails included.
    vocab = sorted({
        w
        for batch in pq.ParquetFile(DRIVER_SF01 / "documents.parquet").iter_batches(
            columns=["text"]
        )
        for txt in batch.column(0).to_pylist()
        for w in txt.split()
    })
    lens = rng.integers(8, 101, n_doc)
    words = rng.choice(vocab, int(lens.sum()))
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    for i in rng.choice(np.arange(n_doc // 10, n_doc), max(1, int(0.003 * n_doc)), replace=False):
        texts[i] = texts[int(rng.integers(0, n_doc // 10))]  # exact dup
    for i in rng.choice(np.arange(n_doc // 10, n_doc), max(1, int(0.015 * n_doc)), replace=False):
        toks = texts[int(rng.integers(0, n_doc // 10))].split()
        toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
        texts[i] = " ".join(toks)  # near dup (1-token mutation)
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": np.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    vecs = rng.normal(size=(n_vec, 64)).astype(np.float32)
    dup_idx = rng.choice(np.arange(n_vec // 10, n_vec), max(1, int(0.05 * n_vec)), replace=False)
    src_idx = rng.integers(0, n_vec // 10, dup_idx.size)
    vecs[dup_idx] = vecs[src_idx] + rng.normal(scale=0.01, size=(dup_idx.size, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), type=pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_vec).astype(np.int32),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        __file__
    ).resolve().parent.parent / "testdata" / f"sf{sf:g}"
    t0 = time.time()
    print(f"generating sf{sf:g} → {out}", flush=True)
    gen(sf, out)
    print(f"done in {time.time() - t0:.1f}s", flush=True)
