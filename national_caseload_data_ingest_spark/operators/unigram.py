"""Unigram-LM (SentencePiece-style) tokenizer training by distributed
hard EM over the ``documents`` table — the second tokenizer family of
the pipeline beside BPE (Kudo, "Subword Regularization", ACL 2018;
Kudo & Richardson, "SentencePiece", EMNLP 2018).

Where BPE's merge loop is inherently sequential (each merge depends on
the last, so it runs on the driver over the bounded word-frequency
dict — bpe.py), unigram-LM training is the opposite: each EM round is a
data-parallel pass, so THIS trainer keeps the heavy step distributed:

1. **Corpus pass (once):** the shared ``word_frequencies`` relation —
   one narrow scan + one word-keyed shuffle.  Heaps' law makes it
   corpus-size-independent; at 100 TB it is the only stage that touches
   the text.
2. **Seeding (one distributed pass):** every substring of length ≤
   ``PIECE_MAX`` of every distinct word, counted with the word's
   frequency — an Arrow kernel emits per-batch partial counts, a
   piece-keyed groupBy folds them, and the top ``SEED_MAX`` pieces by
   (count desc, piece asc) PLUS the full single-character inventory
   (coverage guarantee) become the initial vocabulary.
3. **EM rounds (fixed count):** the E-step is a NARROW Arrow kernel
   over the word-frequency relation — Viterbi-segment each word under
   the current piece log-probabilities (the model is a ≤ vocab-sized
   closure, the tiny-driver-model convention shared with IVF/PQ) and
   emit freq-weighted piece counts combined per batch.  The M-step is
   one piece-keyed groupBy of INTEGER counts, collected (vocab-bounded
   rows) and pruned to the ``VOCAB_TARGET`` + single-chars.  Because
   every count is an exact integer, the trained model is a pure
   function of the corpus — independent of partitioning, batch
   boundaries, and shuffle order — which the parity and invariance
   tests pin.
4. **Encode (narrow):** Viterbi with the final model per word, memoized
   per batch; per-document token counts, no shuffle.

Viterbi determinism: scores are sums of float64 logs in a fixed DP
order; exact-score ties prefer the LONGER final piece (smaller split
point scanned last wins ≥, i.e. ties resolve toward fewer, longer
pieces) — documented so the pure-python reference in
``tests/test_unigram.py`` can reproduce segmentations bit-for-bit.

Registered rows-only (an EM fixpoint has no SQL twin); ground truth is
the pure-python reimplementation parity test plus coverage /
compression / partition-invariance properties.

The reference (/root/reference/ncd/) has no tokenizer surface; this
extends the build brief's text-analysis band.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.bpe import (
    word_frequencies,
)
from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

PIECE_MAX = 6  # longest candidate piece (chars)
SEED_MAX = 8192  # initial vocabulary size (plus single chars)
VOCAB_TARGET = 2048  # pruned vocabulary size (plus single chars)
EM_ROUNDS = 3


def viterbi_pieces(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation of ``word`` into vocabulary pieces under the
    unigram model (max sum of piece log-probs).  Exact-score ties prefer
    the longer final piece.  Every single char is in the vocabulary by
    construction, so a path always exists."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        # j scans longest-piece-first so an equal score later (shorter
        # piece) does NOT replace it (strict >)
        for j in range(max(0, i - PIECE_MAX), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j] == -math.inf:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _seed_kernel(batches):
    """Per-batch freq-weighted counts of every substring of length ≤
    PIECE_MAX of every word — partial combine before the shuffle."""
    import pandas as pd  # noqa: PLC0415

    for pdf in batches:
        if not len(pdf):
            continue
        counts: dict[str, int] = {}
        for word, freq in zip(pdf["word"], pdf["freq"]):
            f = int(freq)
            n = len(word)
            for i in range(n):
                for l in range(1, min(PIECE_MAX, n - i) + 1):
                    p = word[i : i + l]
                    counts[p] = counts.get(p, 0) + f
        yield pd.DataFrame(
            {"piece": list(counts.keys()), "cnt": list(counts.values())}
        )


def _estep_kernel(logp: dict[str, float]):
    """E-step: Viterbi-segment every word under the closure model and emit
    freq-weighted integer piece counts, combined per batch."""

    def gen(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            counts: dict[str, int] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                f = int(freq)
                for p in viterbi_pieces(word, logp):
                    counts[p] = counts.get(p, 0) + f
            yield pd.DataFrame(
                {"piece": list(counts.keys()), "cnt": list(counts.values())}
            )

    return gen


def _model_from_counts(counts: dict[str, int]) -> dict[str, float]:
    """Integer counts → log-probabilities (one division + one log per
    piece — deterministic)."""
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def _prune(
    counts: dict[str, int], chars: set[str], target: int
) -> dict[str, int]:
    """Keep the ``target`` highest-count multi-char pieces (ties to the
    lexicographically smaller piece) plus EVERY single char seen in the
    corpus (coverage: Viterbi must always find a path)."""
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:target]
    kept = {p: c for p, c in multi}
    for ch in chars:
        # a char never chosen by any Viterbi path this round keeps count 1
        # so it stays representable (SentencePiece's required-char rule)
        kept[ch] = max(counts.get(ch, 0), 1)
    return kept


def unigram_train(
    docs: DataFrame,
    seed_max: int = SEED_MAX,
    vocab_target: int = VOCAB_TARGET,
    rounds: int = EM_ROUNDS,
) -> dict[str, float]:
    """Train the unigram tokenizer; returns the final piece → log-prob
    model (≤ vocab_target multi-char pieces + the char inventory)."""
    wf = word_frequencies(docs)
    seed_counts = (
        wf.mapInPandas(_seed_kernel, schema="piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )
    char_rows = seed_counts.filter(F.length("piece") == 1).collect()
    chars = {r["piece"] for r in char_rows}
    top = (
        seed_counts.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(seed_max)
        .collect()
    )
    counts = {r["piece"]: int(r["cnt"]) for r in top}
    for r in char_rows:  # full char inventory at its true seed weight
        counts[r["piece"]] = int(r["cnt"])

    for _ in range(rounds):
        model = _model_from_counts(counts)
        estep = (
            wf.mapInPandas(
                _estep_kernel(model), schema="piece string, cnt long"
            )
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
        counts = _prune(
            {r["piece"]: int(r["cnt"]) for r in estep}, chars, vocab_target
        )
    return _model_from_counts(counts)


def _encode_kernel(logp: dict[str, float]):
    """Per-document token statistics under the final model — narrow, with
    a per-batch word memo (documents repeat words heavily)."""

    def gen(batches):
        import pandas as pd  # noqa: PLC0415

        memo: dict[str, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out_id, out_tok, out_chr = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in text.strip().lower().split() if w]
                n_tok = 0
                n_chr = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(viterbi_pieces(w, logp))
                        memo[w] = n
                    n_tok += n
                    n_chr += len(w)
                out_id.append(doc_id)
                out_tok.append(n_tok)
                out_chr.append(n_chr)
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "n_tokens": out_tok,
                    "n_chars": out_chr,
                }
            )

    return gen


def unigram_encode(docs: DataFrame, logp: dict[str, float]) -> DataFrame:
    """(doc_id, n_tokens, n_chars) under the trained model — one narrow
    Arrow pass, model as a closure constant."""
    return docs.select("doc_id", "text").mapInPandas(
        _encode_kernel(logp),
        schema="doc_id bigint, n_tokens bigint, n_chars bigint",
    )


@query("unigram_tokenize_docs")  # EM fixpoint — pure-python parity in tests
def unigram_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM tokenizer on the corpus (distributed hard EM,
    see module docstring) and tokenize every document with it — per-doc
    token and character counts.  Integer-exact end to end: the result is
    independent of partitioning and shuffle order."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    model = unigram_train(d)
    return unigram_encode(d, model)
