"""Text-analysis operators for LLM-data pipelines over the ``documents``
table: token counting, quality scoring, language ID, fingerprinting.

These are the §7-extension operators from BASELINE.json's north star.  All
four are pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen, zero UDFs — so they run at parquet-scan speed and
scale to 100 TB as embarrassingly-parallel narrow maps (the only shuffle in
this module is the final small aggregate of ``token_count_by_source``).

Every query has a DuckDB oracle built from the *same* integer arithmetic
(counts, lengths) so results hash-match exactly; ratios divide integers in
double precision, which is deterministic because both engines perform the
identical single division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
# Counting ' word ' occurrences is an O(n) scan both engines express as
# (len(s) - len(replace(s, w, ''))) / len(w) — pure integer math.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "de": ["der", "die", "und"],
    "fr": ["le", "les", "des"],
    "zh": ["de", "shi", "bu"],
}


def _occurrences(col: Column, word: str) -> Column:
    """Number of occurrences of `` word `` (space-delimited) in the column."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, needle, "")))
        / len(needle)
    ).cast("int")


def _occurrences_sql(expr: str, word: str) -> str:
    needle = f" {word} "
    padded = f"(' ' || {expr} || ' ')"
    return (
        f"CAST((LENGTH({padded}) - LENGTH(REPLACE({padded}, '{needle}', '')))"
        f" / {len(needle)} AS INTEGER)"
    )


@query(
    "token_count_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS total_tokens,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
               / COUNT(*) AS avg_tokens,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
)
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-source corpus statistics.

    The shuffle key (source) has tiny cardinality, so partial aggregation
    reduces each partition to a handful of rows before the exchange.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        d.select("source", n_tokens.alias("nt"), F.length("text").alias("nc"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            (F.sum("nt").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.sum("nc").alias("total_chars"),
        )
    )


@query(
    "quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_chars,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)
               AS n_tokens,
           CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?]', '', 'g'))
                AS INTEGER) AS n_punct,
           {_occurrences_sql('text', 'the')} AS n_the,
           CASE WHEN LENGTH(text) < 100 THEN 'short'
                WHEN {_occurrences_sql('text', 'the')} = 0 THEN 'no_stopwords'
                ELSE 'ok' END AS quality_band
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: length, punctuation count, stopword hits,
    banded verdict — the filter stage of a pretraining-data pipeline."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_punct = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), "[.,;:!?]", ""))
    )
    n_the = _occurrences(F.col("text"), "the")
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.cast("int").alias("n_punct"),
        n_the.alias("n_the"),
        F.when(n_chars < 100, "short")
        .when(n_the == 0, "no_stopwords")
        .otherwise("ok")
        .alias("quality_band"),
    )


def _lang_scores(col: Column) -> dict[str, Column]:
    out = {}
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            occ = _occurrences(col, w)
            score = occ if score is None else score + occ
        out[lang] = score
    return out


def _lang_scores_sql(expr: str) -> dict[str, str]:
    return {
        lang: " + ".join(_occurrences_sql(expr, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }


@query(
    "lang_id_heuristic",
    oracle=(
        lambda s: f"""
    SELECT doc_id, lang,
           CASE
             WHEN {s['en']} >= {s['es']} AND {s['en']} >= {s['de']}
                  AND {s['en']} >= {s['fr']} AND {s['en']} >= {s['zh']} THEN 'en'
             WHEN {s['es']} >= {s['de']} AND {s['es']} >= {s['fr']}
                  AND {s['es']} >= {s['zh']} THEN 'es'
             WHEN {s['de']} >= {s['fr']} AND {s['de']} >= {s['zh']} THEN 'de'
             WHEN {s['fr']} >= {s['zh']} THEN 'fr'
             ELSE 'zh'
           END AS predicted_lang
    FROM documents
    """
    )(_lang_scores_sql("text")),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic family).

    Argmax over per-language marker-word counts with a fixed tie-break
    order (en > es > de > fr > zh) so both engines pick identical labels.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    s = _lang_scores(F.col("text"))
    predicted = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"])
            & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return d.select("doc_id", "lang", predicted.alias("predicted_lang"))


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(REGEXP_REPLACE(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
           CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 of whitespace-collapsed lowercase
    text) — the join key for cheap cross-corpus exact dedup at scale: 16
    bytes instead of the full document shuffle."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return d.select(
        "doc_id",
        F.md5(normalized.cast("binary")).alias("fingerprint"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# BPE-ish pre-tokenizer: maximal runs of letters, digits, or single other
# non-space characters — the class-based core of GPT-style pre-tokenization,
# restricted to constructs with identical leftmost-maximal semantics in
# Java regex (Spark) and RE2 (DuckDB), so counts hash-match cross-engine.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@query(
    "bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+'))
             AS tokens_per_word
    FROM documents
    """,
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style (BPE-ish regex) token counts next to whitespace
    counts — the token-budget accounting pass of a training-data pipeline.
    Pure codegen'd regexp counting; no UDFs, no shuffle."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    n_bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    )
    n_ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        n_ws.cast("bigint").alias("n_ws_tokens"),
        (n_bpe.cast("double") / n_ws).alias("tokens_per_word"),
    )


VOCAB_TOP_K = 50
HIST_BUCKET = 10


@query(
    "token_frequency_topk",
    oracle=f"""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_frequency
    FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY n_occurrences DESC, tok
    LIMIT {VOCAB_TOP_K}
    """,
)
def token_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: the top-VOCAB_TOP_K tokens by
    total occurrences, with document frequency alongside — the
    vocab-building / stopword-discovery pass of a corpus pipeline.

    explode → partial-aggregating groupBy (map-side combine keeps the
    shuffle at one row per distinct token per task, not per occurrence)
    → ``TakeOrderedAndProject`` (per-partition heaps, never a global
    sort).  Tie-break on the token keeps the cut deterministic."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_frequency"),
        )
        .orderBy(F.col("n_occurrences").desc(), "tok")
        .limit(VOCAB_TOP_K)
    )


@query(
    "token_length_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(len(string_split_regex(trim(text), '\\s+'))
                      / {HIST_BUCKET}) * {HIST_BUCKET} AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
             AS total_tokens
    FROM documents
    GROUP BY 1
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in fixed-width token buckets — the
    profile that drives quality-filter thresholds and shard budgets.
    One partial-aggregating shuffle over ~corpus/bucket_width groups."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    nt = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bucket = (F.floor(nt / HIST_BUCKET) * HIST_BUCKET).cast("bigint")
    return (
        d.select(bucket.alias("bucket_lo"), nt.alias("nt"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
        )
    )


@query(
    "rare_token_fraction",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    totals AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS n_vocab
        FROM vocab
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.c * tt.n_vocab < tt.n_total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rare,
           CAST(SUM(CASE WHEN v.c * tt.n_vocab < tt.n_total THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS rare_fraction,
           CAST(SUM(v.c) AS BIGINT) AS freq_mass,
           CAST(SUM(v.c) AS DOUBLE) / COUNT(*) AS mean_token_freq
    FROM toks t JOIN vocab v USING (tok) CROSS JOIN totals tt
    GROUP BY t.doc_id
    """,
)
def rare_token_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency quality scoring (the integer-exact core of a
    CCNet-style unigram-LM filter): score every document by how much of it
    is made of rare tokens, where *rare* means corpus frequency below the
    corpus mean.

    Two passes over the exploded token stream: (1) aggregate the unigram
    model (one shuffle on token, heavy map-side combine — the shuffle
    carries one row per distinct token per task); (2) join occurrences back
    to the model on token and aggregate per document.  The model side is
    vocabulary-sized, so AQE promotes it to a broadcast join when it fits
    (it does here; at web scale the standard play is top-V vocabulary
    broadcast with out-of-vocabulary treated as rare — same contract, and
    the join below stays a plain shuffle join if the model outgrows the
    broadcast threshold).

    Everything that crosses engines is integer arithmetic: the rare rule
    compares ``c * n_vocab < n_total`` (cross-multiplied mean — no
    division), and the two ratio columns are each a single double division
    of two exact BIGINTs, so results hash-match DuckDB bit-for-bit.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
    )
    is_rare = (F.col("c") * F.col("n_vocab") < F.col("n_total")).cast("int")
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(is_rare).cast("bigint").alias("n_rare"),
            (F.sum(is_rare).cast("double") / F.count(F.lit(1))).alias(
                "rare_fraction"
            ),
            F.sum("c").cast("bigint").alias("freq_mass"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias(
                "mean_token_freq"
            ),
        )
    )


@query(
    "lexical_diversity_by_source",
    oracle="""
    WITH tc AS (
        SELECT source, tok, COUNT(*) AS c
        FROM (SELECT source,
                     unnest(string_split_regex(lower(trim(text)), '\\s+'))
                       AS tok
              FROM documents)
        GROUP BY source, tok
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_tokens,
           CAST(COUNT(*) AS DOUBLE) / SUM(c) AS type_token_ratio
    FROM tc
    GROUP BY source
    """,
)
def lexical_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: type-token ratio and hapax
    count — the cheap screen for template/boilerplate sources (near-zero
    diversity) and for synthetic-looking uniform text (zero hapaxes).

    Two partial-aggregating shuffles, both tiny on the reduce side: the
    first keys on (source, token) — bounded by sources x vocabulary — and
    the second folds that to one row per source.  No token row ever
    crosses the wire un-combined, so the plan is insensitive to corpus
    row count: exactly the shape that survives 100 TB."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    tc = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "tok"
            ),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_tokens"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("hapax_tokens"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("type_token_ratio"),
    )


@query(
    "repetition_score",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id, lang,
               CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 1 END
                 AS total_grams,
               CASE WHEN len(toks) >= 2
                    THEN len(list_distinct(list_transform(
                         range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1])))
                    ELSE 1 END AS distinct_grams
        FROM t
    )
    SELECT doc_id, lang,
           CAST(total_grams AS BIGINT) AS total_grams,
           CAST(distinct_grams AS BIGINT) AS distinct_grams,
           1.0 - CAST(distinct_grams AS DOUBLE) / total_grams
             AS repetition
    FROM g
    """,
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: 1 − distinct/total word bigrams — the
    Gopher-style duplicate-n-gram quality signal (boilerplate and
    degenerate generations score high; filtering is then a plain
    threshold on the column).  Pure narrow column expressions — the
    higher-order lambda runs once per doc over a bounded token array, not
    in a pair loop, so it stays cheap despite being interpreted."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - 1)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))
    )
    total = F.when(n >= 2, n - 1).otherwise(F.lit(1))
    distinct = F.when(n >= 2, F.size(F.array_distinct(grams))).otherwise(F.lit(1))
    return d.select(
        "doc_id",
        "lang",
        total.cast("bigint").alias("total_grams"),
        distinct.cast("bigint").alias("distinct_grams"),
        (F.lit(1.0) - distinct.cast("double") / total).alias("repetition"),
    )
