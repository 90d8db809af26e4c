"""Generate a LOCAL sf1 dataset (10x sf0.1) for the measured scaling
curve (VERDICT r10 ask #5).

/root/testdata is driver-owned and read-only, so sf1 lives under
the repo at testdata_sf1/.  The generator mirrors sf0.1's EMPIRICAL
structure rather than inventing distributions: document word counts and
word frequencies are resampled from the real tables, the per-capita
exact-duplicate and mutation-near-dup rates are preserved (so pair-type
outputs scale by their intrinsic exponent, which is the thing being
measured), embeddings resample real vectors with small jitter
(preserving the label/cluster geometry PQ trains on), and orders keep
the key layout and category marginals.

Only the three tables the top-10 heavy queries load are generated:
documents (50k rows), embeddings (20k), orders (1.5M).

Long-tail mode (``--tail-frac F --tail-vocab N``): a fraction F of
document tokens is drawn from an N-word uniform long tail instead of
the 31-word base vocabulary — the Heaps'-law regime real corpora live
in, where rare grams exist and the PREFIX/LSH tiers (not the dense
bitset tier) are the active plans.  Generate a matched PAIR of
directories (``--scale 1`` and ``--scale 10``) to measure exponents
within one regime.

Usage: python tools/gen_sf1.py [out_dir] [--scale N]
                               [--tail-frac F] [--tail-vocab N]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE = 10
SEED = 42
TAIL_FRAC = 0.0
TAIL_VOCAB = 1000


def gen_documents(out_dir: str, rng: np.random.Generator) -> None:
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    texts = [r[1] for r in rows]
    langs = [r[2] for r in rows]
    sources = [r[3] for r in rows]
    words = [w for t in texts for w in t.split(" ")]
    vocab, counts = np.unique(np.array(words), return_counts=True)
    word_p = counts / counts.sum()
    n_words_emp = np.array([len(t.split(" ")) for t in texts])

    n = len(texts) * SCALE
    out_text: list[str] = []
    # sf0.1 has 8/5000 exact dups; mutation near-dups at ~3% keep the
    # near-dup family (minhash/ppjoin/pagerank) load-bearing at sf1
    kind = rng.choice(
        ["iid", "dup", "mut"], size=n, p=[0.952, 0.016, 0.032]
    )
    for i in range(n):
        if kind[i] == "dup" and out_text:
            out_text.append(out_text[rng.integers(0, len(out_text))])
        elif kind[i] == "mut" and out_text:
            base = out_text[rng.integers(0, len(out_text))].split(" ")
            k = max(1, len(base) // 10)
            idx = rng.choice(len(base), size=k, replace=False)
            for j in idx:
                base[j] = str(vocab[rng.choice(len(vocab), p=word_p)])
            out_text.append(" ".join(base))
        else:
            nw = int(n_words_emp[rng.integers(0, len(n_words_emp))])
            ws = list(vocab[rng.choice(len(vocab), size=nw, p=word_p)])
            if TAIL_FRAC > 0:
                # Heaps-regime tail: replace a fraction of tokens with
                # uniform draws from an N-word long tail
                k = int(round(nw * TAIL_FRAC))
                if k:
                    idx = rng.choice(nw, size=k, replace=False)
                    tail = rng.integers(0, TAIL_VOCAB, k)
                    for j, t in zip(idx, tail):
                        ws[j] = f"t{int(t)}"
            out_text.append(" ".join(ws))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(
                [langs[int(i)] for i in rng.integers(0, len(langs), n)],
                pa.string(),
            ),
            "source": pa.array(
                [sources[int(i)] for i in rng.integers(0, len(sources), n)],
                pa.string(),
            ),
            "n_chars": pa.array(
                [len(t) for t in out_text], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(out_dir: str, rng: np.random.Generator) -> None:
    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    base = np.array([r[1] for r in rows], dtype=np.float32)
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    n = len(rows) * SCALE
    pick = rng.integers(0, len(rows), n)
    emb = base[pick] + rng.normal(0, 0.05, (n, base.shape[1])).astype(
        np.float32
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in emb], pa.list_(pa.float32())
            ),
            "label": pa.array(labels[pick].tolist(), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def gen_orders(out_dir: str, rng: np.random.Generator) -> None:
    rows = duckdb.sql(
        f"SELECT o_orderstatus, o_orderpriority FROM '{SRC}/orders.parquet'"
    ).fetchall()
    statuses = [r[0] for r in rows]
    priorities = [r[1] for r in rows]
    n = len(rows) * SCALE
    pick = rng.integers(0, len(rows), n)
    dates = np.datetime64("1995-01-01") + rng.integers(
        0, 2404, n
    ).astype("timedelta64[D]")
    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, 15_000 * SCALE, n), pa.int64()
            ),
            "o_orderstatus": pa.array(
                [statuses[int(i)] for i in pick], pa.string()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500_000, n), 2), pa.float64()
            ),
            "o_orderdate": pa.array(
                dates.astype("datetime64[us]"), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                [priorities[int(i)] for i in pick], pa.string()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "orders.parquet"))


def gen_events(out_dir: str, rng: np.random.Generator) -> None:
    """Events ×SCALE: empirical event-type marginals, 30-day µs
    timestamps, user cardinality scaled with the table (the round-11
    continuation codecs — msgpack/protobuf/cbor/CLF — load events)."""
    rows = duckdb.sql(
        f"SELECT event_type FROM '{SRC}/events.parquet'"
    ).fetchall()
    types = [r[0] for r in rows]
    n = len(rows) * SCALE
    pick = rng.integers(0, len(rows), n)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 30 * 86_400_000_000, n).astype(
        "timedelta64[us]"
    )
    ks = rng.integers(0, 100, n)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, 2_000 * SCALE, n), pa.int64()
            ),
            "event_type": pa.array(
                [types[int(i)] for i in pick], pa.string()
            ),
            "value": pa.array(
                np.round(rng.uniform(0, 1000, n), 4), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in ks], pa.string()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"))


def gen_tpch(out_dir: str, rng: np.random.Generator) -> None:
    """The TPC-H-ish tables xSCALE (r14: the full-catalog sf1 replay
    needs every table, not just the four the heavy queries load).
    Dimensions keep their key layout (sequential 0-based keys, name
    patterns, empirical category marginals); lineitem resamples WHOLE
    rows (preserving intra-row correlations like extendedprice ~
    quantity) and reassigns keys: per-order line counts drawn from the
    empirical distribution, part/supp keys uniform over the scaled
    ranges.  region/nation are fixed-size and copy verbatim."""
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       os.path.join(out_dir, f"{t}.parquet"))

    n_cust = 15_000 * SCALE
    mkts = [r[0] for r in duckdb.sql(
        f"SELECT c_mktsegment FROM '{SRC}/customer.parquet'").fetchall()]
    pick = rng.integers(0, len(mkts), n_cust)
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{k:09d}" for k in range(n_cust)],
                           pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 10_000, n_cust), 2),
                              pa.float64()),
        "c_mktsegment": pa.array([mkts[int(i)] for i in pick], pa.string()),
    }), os.path.join(out_dir, "customer.parquet"))

    n_supp = 1_000 * SCALE
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{k:09d}" for k in range(n_supp)],
                           pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 10_000, n_supp), 2),
                              pa.float64()),
    }), os.path.join(out_dir, "supplier.parquet"))

    n_part = 20_000 * SCALE
    prows = duckdb.sql(
        f"SELECT p_name, p_brand, p_type FROM '{SRC}/part.parquet'"
    ).fetchall()
    pick = rng.integers(0, len(prows), n_part)
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([prows[int(i)][0] for i in pick], pa.string()),
        "p_brand": pa.array([prows[int(i)][1] for i in pick], pa.string()),
        "p_type": pa.array([prows[int(i)][2] for i in pick], pa.string()),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 2),
            pa.float64()),
    }), os.path.join(out_dir, "part.parquet"))

    # lineitem: empirical per-order line counts, whole-row resampling
    n_orders = 150_000 * SCALE
    counts = [r[0] for r in duckdb.sql(
        f"SELECT COUNT(*) FROM '{SRC}/lineitem.parquet'"
        " GROUP BY l_orderkey").fetchall()]
    per_order = np.array(counts)[rng.integers(0, len(counts), n_orders)]
    n_li = int(per_order.sum())
    lrows = duckdb.sql(
        "SELECT l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate"
        f" FROM '{SRC}/lineitem.parquet'").arrow()
    pick = rng.integers(0, lrows.num_rows, n_li)
    okeys = np.repeat(np.arange(n_orders, dtype=np.int64), per_order)
    linenos = (np.arange(n_li, dtype=np.int64)
               - np.repeat(np.cumsum(per_order) - per_order, per_order)
               + 1)
    cols = {
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenos.astype(np.int32), pa.int32()),
    }
    for name in ("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"):
        cols[name] = lrows.column(name).take(pa.array(pick))
    pq.write_table(pa.table(cols), os.path.join(out_dir, "lineitem.parquet"))


def main() -> None:
    global SCALE, TAIL_FRAC, TAIL_VOCAB
    args = sys.argv[1:]
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--scale":
            SCALE = int(args[i + 1])
            i += 2
        elif args[i] == "--tail-frac":
            TAIL_FRAC = float(args[i + 1])
            i += 2
        elif args[i] == "--tail-vocab":
            TAIL_VOCAB = int(args[i + 1])
            i += 2
        else:
            pos.append(args[i])
            i += 1
    out_dir = pos[0] if pos else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    gen_documents(out_dir, rng)
    gen_embeddings(out_dir, rng)
    gen_orders(out_dir, rng)
    gen_events(out_dir, rng)
    gen_tpch(out_dir, rng)
    for t in ("documents", "embeddings", "orders", "events",
              "region", "nation", "customer", "supplier", "part",
              "lineitem"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
