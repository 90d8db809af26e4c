"""Statistical language-model operators over the ``documents`` table:
distributed bigram-LM training and held-out perplexity scoring.

LM-perplexity filtering is the CCNet / Gopher-style quality gate of a
training-data pipeline: train a small LM on a trusted split, score every
candidate document, and drop (or down-weight) the high-perplexity tail.
This module re-expresses that pass Spark-first:

* **The model is a DataFrame, not a broadcast.**  Bigram and context
  counts stay distributed and attach to the held-out stream via shuffle
  joins keyed on the n-gram — at web scale the bigram relation (typos,
  URLs, code) easily exceeds driver memory, so a broadcast vocabulary is
  exactly the scale-killer we avoid (same reasoning as the TF-IDF df
  join, ``text.py``).  AQE promotes the join to broadcast at runtime when
  the trained model really is small, and handles hot-bigram skew
  otherwise.
* **Everything is codegen.**  Tokenization is ``split``; bigram
  construction is ``transform``+``slice`` over the token array (no UDF);
  the only Python in the pass is plan construction.
* **Scalars are one-row broadcasts.**  Vocabulary size V joins in as a
  broadcast single-row aggregate — never a driver ``collect``.

The train/held-out split is ``doc_id % 10`` (deterministic, engine-
independent) so the DuckDB oracle reproduces the exact model.  Smoothing
is add-k with k=0.5: P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V); an
unseen context degrades to the uniform 1/V.  Both engines evaluate the
identically-parenthesized double expression, so scores hash-match at the
harness's 1e-6 print precision.

The reference (/root/reference/ncd/) has no LM surface; this implements
the build brief's text-analysis/quality-scoring extension band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

# Add-k smoothing constant.  Keep the literal in sync with the oracle SQL.
LM_K = 0.5

# doc_id % 10 < LM_TRAIN_MOD → training split; the rest are scored.
LM_TRAIN_MOD = 8


def _tokens(d: DataFrame) -> DataFrame:
    """``doc_id``, token array ``t`` (lowercased, whitespace-split)."""
    return d.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
    )


def _bigrams(toks: DataFrame) -> DataFrame:
    """Explode each token array into (doc_id, w1, w2) adjacent pairs.

    ``transform`` over ``slice(t, 1, size-1)`` pairs token i with token
    i+1 entirely inside whole-stage codegen — no UDF, no posexplode
    self-join.  Docs with fewer than two tokens contribute no rows.
    """
    pairs = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
        " (w, i) -> named_struct('w1', w, 'w2', element_at(t, i + 2)))"
    )
    return toks.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )


def train_bigram_lm(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram model on the ``doc_id % 10 < LM_TRAIN_MOD`` split.

    Returns ``(bigram_counts, ctx_counts, vocab_size)``:

    * ``bigram_counts`` — (w1, w2, c): one groupBy shuffle on the pair.
    * ``ctx_counts`` — (w1, c1): c(w1·), derived from bigram_counts by a
      second (much smaller) aggregate, not a rescan.
    * ``vocab_size`` — single-row (v): distinct training unigrams.

    All three stay DataFrames; nothing is collected.
    """
    train = _tokens(docs.filter(F.col("doc_id") % 10 < LM_TRAIN_MOD))
    big = _bigrams(train)
    bigram_counts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx_counts = bigram_counts.groupBy("w1").agg(F.sum("c").alias("c1"))
    vocab_size = (
        train.select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    return bigram_counts, ctx_counts, vocab_size


def score_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    ctx_counts: DataFrame,
    vocab_size: DataFrame,
) -> DataFrame:
    """Score the held-out split: per-doc bigram count, OOV-bigram
    fraction, mean negative log-likelihood, and perplexity.

    Plan: explode held-out bigrams → left join the model on (w1, w2) and
    on w1 (shuffle joins; AQE broadcasts a small model at runtime) →
    codegen'd smoothed log-probability → one groupBy(doc_id) aggregate.
    """
    held = _bigrams(_tokens(docs.filter(F.col("doc_id") % 10 >= LM_TRAIN_MOD)))
    scored = (
        held.join(bigram_counts, ["w1", "w2"], "left")
        .join(ctx_counts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab_size))
        .withColumn(
            "logp",
            F.expr(
                f"ln((coalesce(c, 0) + {LM_K}) /"
                f" (coalesce(c1, 0) + ({LM_K} * v)))"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(F.when(F.col("c").isNull(), 1).otherwise(0)).alias("oov_frac"),
        (-F.avg("logp")).alias("avg_nll"),
        F.exp(-F.avg("logp")).alias("ppl"),
    )


_LM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents
),
train_big AS (
    SELECT unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i+1])) AS bg
    FROM toks WHERE doc_id % 10 < {LM_TRAIN_MOD}
),
bigram_counts AS (
    SELECT split_part(bg, ' ', 1) AS w1,
           split_part(bg, ' ', 2) AS w2,
           COUNT(*) AS c
    FROM train_big GROUP BY 1, 2
),
ctx_counts AS (
    SELECT w1, SUM(c) AS c1 FROM bigram_counts GROUP BY w1
),
vocab AS (
    SELECT COUNT(DISTINCT tok) AS v FROM (
        SELECT unnest(t) AS tok FROM toks
        WHERE doc_id % 10 < {LM_TRAIN_MOD}
    )
),
held AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i+1])) AS bg
    FROM toks WHERE doc_id % 10 >= {LM_TRAIN_MOD}
),
scored AS (
    SELECT h.doc_id,
           b.c,
           ln((coalesce(b.c, 0) + {LM_K}) /
              (coalesce(x.c1, 0) + ({LM_K} * v.v))) AS logp
    FROM held h
    LEFT JOIN bigram_counts b
      ON split_part(h.bg, ' ', 1) = b.w1
     AND split_part(h.bg, ' ', 2) = b.w2
    LEFT JOIN ctx_counts x ON split_part(h.bg, ' ', 1) = x.w1
    CROSS JOIN vocab v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       AVG(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS oov_frac,
       -AVG(logp) AS avg_nll,
       exp(-AVG(logp)) AS ppl
FROM scored
GROUP BY doc_id
"""


@query("lm_perplexity", oracle=_LM_ORACLE)
def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity quality scores for the held-out 20% of the
    corpus (train on ``doc_id % 10 < 8``, score the rest) — the
    CCNet/Gopher LM-filter pass.  See module docstring for the
    scale-first plan shape."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    bigram_counts, ctx_counts, vocab_size = train_bigram_lm(d)
    return score_perplexity(d, bigram_counts, ctx_counts, vocab_size)
