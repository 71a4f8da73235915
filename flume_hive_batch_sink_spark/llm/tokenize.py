"""Round-11 extension keys: tokenizer APPLICATION over a corpus.

`llm_bpe_merges` (llm/text.py) trains BPE-style merges; this module
covers the other half of the tokenizer lifecycle — ENCODING a corpus
with learned merges and auditing the result. The headline statistic is
**fertility** (tokens emitted per word), the standard tokenizer-eval
number (e.g. SentencePiece / multilingual-tokenizer papers): a language
whose fertility is high pays more sequence length per word of content,
which directly shifts its effective share of a token budget.

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: the corpus-scale work is ONE map-side-combined hash
aggregation to (lang, word) counts — the shuffle carries vocabulary
rows, not document rows. Training and encoding then run on the DISTINCT
vocabulary (bounded by vocabulary size — millions of rows at web scale,
not billions of documents), and the encoded vocabulary broadcasts back
onto the per-lang counts, so the corpus is scanned exactly once and
never re-shuffled. Per merge round the driver pulls ONE 2-string row
(the argmax pair — the scalar-certificate convention shared with
llm_bpe_merges and the clustering loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

# Char-level merge rounds. 6 is enough to form multi-char subword units
# over the fixture vocabulary (max word length 8) while keeping the
# unrolled oracle readable; real tokenizers run ~30k rounds of the same
# dataflow with an in-memory pair-delta structure.
_ENC_ROUNDS = 6


def _bpe_encode_oracle() -> str:
    """Unrolled DuckDB twin: the same greedy weighted merges, round by
    round, as chained CTEs (the same construction as text._bpe_oracle).
    The '|c1||c2|' pair-encoded state makes greedy non-overlapping
    replace order engine-identical."""
    parts = [
        """
    WITH wc AS (
      SELECT lang, w AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY 1, 2
    ), vw AS (
      SELECT word, SUM(cnt) AS wcnt FROM wc GROUP BY 1
    ), s0 AS (
      SELECT word, wcnt,
             '|' || substr(regexp_replace(word, '(.)', '\\1||', 'g'),
                           1, 3 * length(word) - 2) || '|' AS s
      FROM vw
    )"""
    ]
    for r in range(_ENC_ROUNDS):
        parts.append(f"""
    , p{r} AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, SUM(wcnt) AS c
      FROM (SELECT wcnt,
                   string_split(substr(s, 2, length(s) - 2), '||') AS t
            FROM s{r}),
           LATERAL (SELECT unnest(range(1, len(t))) AS i) ix
      GROUP BY 1, 2
    ), b{r} AS (
      SELECT w1, w2 FROM p{r} ORDER BY c DESC, w1, w2 LIMIT 1
    ), s{r + 1} AS (
      -- LEFT JOIN + COALESCE: an empty b{r} (merges exhausted) must
      -- carry the state forward unchanged, matching the engine's loop
      -- break — a plain cross join would silently EMPTY the state
      SELECT word, wcnt,
             COALESCE(replace(s, '|' || w1 || '||' || w2 || '|',
                              '|' || w1 || w2 || '|'), s) AS s
      FROM s{r} LEFT JOIN b{r} ON TRUE
    )""")
    parts.append(f"""
    , enc AS (
      SELECT word,
             CAST(len(string_split(substr(s, 2, length(s) - 2), '||'))
                  AS BIGINT) AS ntok
      FROM s{_ENC_ROUNDS}
    )
    SELECT wc.lang,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * ntok) AS BIGINT) AS n_tokens,
           CAST(ROUND(SUM(cnt * ntok) * 1.0 / SUM(cnt), 6) AS DOUBLE)
             AS fertility,
           CAST(ROUND(SUM(cnt * length(word)) * 1.0 / SUM(cnt * ntok), 6)
                AS DOUBLE) AS chars_per_token
    FROM wc JOIN enc USING (word)
    GROUP BY 1
    """)
    return "".join(parts)


@query("llm_bpe_encode", oracle=_bpe_encode_oracle())
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-level BPE ENCODE + per-language fertility audit: train
    ``_ENC_ROUNDS`` greedy merges on corpus-weighted character-pair
    frequencies, encode the vocabulary, and report per-lang token
    counts, fertility (tokens/word) and chars/token.

    Merge training weights pairs by CORPUS frequency (sum of word
    counts), exactly like BPE — but both training and encoding operate
    on the distinct-vocabulary relation, which is bounded by |vocab|,
    not corpus size. The '|c1||c2|' pair-encoded state string (shared
    with llm_bpe_merges) keeps greedy non-overlapping merge application
    engine-identical; ties on pair weight break lexicographically.

    Plan shape: corpus → (lang, word, cnt) is the single full-data
    aggregation (map-side combine; key space = langs × vocab); each
    merge round aggregates the tiny vocab relation and collects ONE
    argmax row; the final encode joins back via F.broadcast(enc), so
    the big side never shuffles again."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
    )
    vw = wc.groupBy("word").agg(F.sum("cnt").alias("wcnt"))
    state = vw.select(
        "word",
        "wcnt",
        F.concat(
            F.lit("|"),
            F.expr(
                "substring(regexp_replace(word, '(.)', '$1||'),"
                " 1, 3 * length(word) - 2)"
            ),
            F.lit("|"),
        ).alias("s"),
    ).localCheckpoint(eager=True)  # vocab-sized; freezes the merge base
    for _ in range(_ENC_ROUNDS):
        toks = state.select(
            "wcnt",
            F.split(
                F.expr("substring(s, 2, length(s) - 2)"), "\\|\\|"
            ).alias("t"),
        )
        pairs = toks.select(
            "wcnt",
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                )
            ).alias("p"),
        ).select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"), "wcnt")
        rows = (
            pairs.groupBy("w1", "w2")
            .agg(F.sum("wcnt").alias("c"))
            .orderBy(F.col("c").desc(), "w1", "w2")
            .limit(1)
            .collect()
        )
        if not rows:
            # merges exhausted (degenerate corpus whose vocabulary fully
            # merged before _ENC_ROUNDS): no-op the remaining rounds, the
            # same fixed point the oracle's LEFT JOIN + COALESCE reaches
            break
        best = rows[0]
        state = state.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f"|{best.w1}||{best.w2}|"),
                F.lit(f"|{best.w1}{best.w2}|"),
            ),
        )
    enc = state.select(
        "word",
        F.size(
            F.split(F.expr("substring(s, 2, length(s) - 2)"), "\\|\\|")
        ).cast("long").alias("ntok"),
    )
    joined = wc.join(F.broadcast(enc), "word")
    return joined.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.col("ntok")).cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.col("cnt") * F.col("ntok"))
            / F.sum("cnt").cast("double"),
            6,
        ).alias("fertility"),
        F.round(
            F.sum(F.col("cnt") * F.length("word"))
            / F.sum(F.col("cnt") * F.col("ntok")).cast("double"),
            6,
        ).alias("chars_per_token"),
    )
