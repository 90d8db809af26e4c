"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output: the FULL record (all timing variants + the env/steal block) as
one JSON line, then a COMPACT contract-shaped line {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {name: median_sec},
"sf": ...} printed LAST, sized to survive the driver's byte-bounded
tail capture (the r9 record was truncated mid-JSON).  The full record
is also written to BENCH_FULL.json next to this script.

Each query is executed once with a count-style action that materializes the
full result (foreach-noop would skip result construction; collect would bill
driver transfer — count() runs the complete plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _cpu_sample() -> dict | None:
    """One /proc/stat aggregate-cpu reading (USER_HZ ticks), or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        v = [int(x) for x in parts[1:]]
    except (OSError, ValueError, IndexError):
        return None
    # cpu: user nice system idle iowait irq softirq steal ...
    return {
        "total": sum(v),
        "idle": v[3] + (v[4] if len(v) > 4 else 0),
        "steal": v[7] if len(v) > 7 else 0,
    }


def _loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return None


def _cpu_delta(before: dict | None, after: dict | None) -> dict | None:
    """Steal seconds and host busy fraction over a [before, after] window.

    Three rounds of cross-round bench whiplash (8.7→27.8→12.6→17.7 s on
    monotone-improving code) were attributed to vCPU steal that the JSON
    could not evidence; this block lets a reader separate host contention
    from real regressions.
    """
    if not before or not after:
        return None
    import os as _os  # noqa: PLC0415

    hz = _os.sysconf("SC_CLK_TCK") or 100
    ncpu = _os.cpu_count() or 1
    dt = after["total"] - before["total"]
    if dt <= 0:
        return None
    return {
        "steal_sec": round((after["steal"] - before["steal"]) / hz, 3),
        "busy_frac": round(1.0 - (after["idle"] - before["idle"]) / dt, 4),
        "steal_frac": round((after["steal"] - before["steal"]) / dt, 4),
        "wall_sec": round(dt / hz / ncpu, 3),
    }


def window_dirtiness(
    bench_window: dict | None, clean_frac: float = 0.005
) -> tuple[bool, str]:
    """Whole-window steal gate (VERDICT r13 finding #1).

    Per-query dirtiness only trips when NO run of a query got a clean
    CPU window, so UNIFORM background steal (every run inflated ~20%,
    none individually above threshold... or all above but a retry lands
    clean) can leave ``steal_dirty`` empty on a polluted sheet.  The
    whole-window fraction cannot be gamed that way: if the host stole
    more than ``clean_frac`` of the ENTIRE bench window, the artifact is
    marked dirty regardless of per-query flags.

    Returns ``(dirty, reason)``; ``reason`` is "" when clean.
    """
    if bench_window is None:
        return True, "no /proc/stat sample — window steal unmeasurable"
    frac = bench_window.get("steal_frac")
    if frac is None:
        return True, "bench_window lacks steal_frac"
    if frac > clean_frac:
        return True, (
            f"whole-window steal_frac {frac} exceeds {clean_frac}; "
            "uniform host steal inflates every sample without tripping "
            "per-query flags — treat all timings as polluted"
        )
    return False, ""


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q18_large_orders",
    "window_rank_orders",
    "window_running_total",
    "cube_returnflag_status",
    "tumbling_window_events",
    "token_count_by_source",
    "doc_fingerprint",
    "ngram_jaccard_pairs",
    "minhash_lsh_neardup",
    "cosine_topk_bruteforce",
    "multimodal_byte_features",
    # round-6: the distributed-model text path (bigram-LM perplexity) —
    # explode + two count shuffles + two model joins, the heaviest new
    # plan family of the analytics expansion
    "lm_perplexity",
    # round-7: the heavyweight operators most likely to regress were
    # previously unmeasured (VERDICT r6 item 7) — iterative graph
    # (pagerank over the near-dup graph), prefix-filtered exact
    # similarity join, skew-immune sorted-neighborhood linkage, and the
    # 7-stage composed corpus build
    "neardup_pagerank",
    "ppjoin_neardup_pairs",
    "link_customer_records_snb",
    "training_corpus_build",
    # round-7: codec representatives — the pure-Python Arrow kernels
    # (multi-scan JPEG assembly, AVI parse + per-frame decode) are the
    # paths most likely to regress without a wall-clock signal
    "jpeg_progressive_decode_features",
    "mjpeg_frame_features",
    # round-7 closing additions: trained-model paths (PQ codebooks,
    # unigram EM) whose iteration structure could silently regress, and
    # the one-scan bootstrap whose 64-aggregate plan is codegen-heavy
    "ann_pq_topk",
    "unigram_tokenize_docs",
    "bootstrap_order_value_ci",
    # round-10: the VP8 key-frame decode chain (bool decoder + token
    # trees + prediction + transforms per payload) is the heaviest
    # pure-Python codec kernel yet — wall-clock signal required
    "vp8_decode_features",
    # round-10: DSIR (two gram shuffles + broadcast model rejoin) and
    # the WordPiece greedy-encode Arrow kernel — the new text-pipeline
    # paths whose regressions wall-clock alone would catch
    "dsir_importance_weights",
    "wordpiece_tokenize_docs",
    # round-10 second sweep: the densest new codec kernel (per-entry ICO
    # walk incl. sub-byte DIB unpack) and the pure-codegen URL pipeline
    # (a regression here means a UDF or shuffle crept into a path that
    # must stay whole-stage)
    "ico_decode_features",
    "url_canonical_features",
    # round-11 (VERDICT r10 ask #8): the container walks a real crawl
    # pipeline runs at scale — WARC record walk incl. de-chunk + gunzip,
    # the MPEG-audio frame walk incl. free-format sync-scan inference,
    # and the Avro encode/decode round-trip on the timestamp table —
    # plus the nested-Avro round-trip (struct/array/map codec kernels)
    # and the containment join's new dense bitset tier
    "warc_record_features",
    "mp3_stream_features",
    "avro_roundtrip_events",
    "avro_nested_roundtrip",
    "containment_quote_pairs",
    # round-11 second sweep: the new shard/codec kernels (native ustar
    # walk + WDS grouping, QOI all-op decode, archive sniff+decompress)
    "webdataset_shard_features",
    "qoi_decode_features",
    "archive_codec_features",
    # round-11 third sweep: the new interchange codecs (native SQLite
    # b-tree walk incl. overflow chains, MessagePack stream, protobuf
    # wire decode with unknown-field skipping, Avro enum/fixed/unions),
    # the lakehouse ops (txlog snapshot+time-travel, multi-clause
    # MERGE), and the crawl-curation band (anchor graph, CIDR screen,
    # robots evaluation)
    "sqlite_roundtrip_documents",
    "msgpack_roundtrip_events",
    "protobuf_roundtrip_events",
    "avro_union_roundtrip",
    "txlog_time_travel",
    "merge_apply_changes",
    "html_link_graph",
    "ip_cidr_filter",
    "robots_txt_allow",
    # round-11 fourth sweep: mail formats (stdlib-built fixtures through
    # the native MIME/mbox parsers), the CBOR sequence codec, the CLF
    # regexp pipeline, gear-hash CDC, and the fertility rollup (the
    # recursive-CTE-oracled WordPiece encode under aggregation)
    "mime_message_features",
    "mbox_thread_features",
    "cbor_roundtrip_events",
    "access_log_features",
    "cdc_chunk_features",
    "wordpiece_efficiency_by_source",
    # round-11 fifth sweep: the crawl-band E2E composition (five real
    # stages in one plan) and the native SQLite walk
    "crawl_corpus_build",
    # round-11 sixth sweep: the git pack walk (zlib boundaries + delta
    # replay per payload) and the reference-encoder/native-decoder
    # snappy seam
    "git_pack_features",
    "snappy_roundtrip_documents",
    # round-11 seventh sweep: the founding-format walk (ZIP central
    # directory + CRC verification) and the PDF subset extraction
    "zip_member_features",
    "pdf_text_features",
    # round 12: the frozen-vocab WordPiece encode whose oracle checks
    # the actual token strings (zip/pdf/sqlite entries above now carry
    # the zip64 / xref-stream / WAL container rotations), and the
    # native parquet data-page reader fed by the repo's own
    # snappy/zstd codecs
    "wordpiece_frozen_encode",
    "parquet_native_roundtrip",
    "bpe_frozen_encode",
    "unigram_frozen_encode",
    # round 14: the frozen-permutation LSH candidate pipeline (the
    # oracle-backed twin of the streaming near-dup path) — banded
    # signature generation + bucket self-join is the shuffle shape the
    # whole dedup family rides on
    "streaming_lsh_frozen_candidates",
]


def main() -> None:
    import __spark_entry__ as ent
    from national_caseload_data_ingest_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    qs = ent.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE and n.startswith("dedup_")
    ]

    # Warm the JVM + parquet footers once so per-query timings measure the
    # query, not session bring-up.
    qs["q6_revenue_forecast"](spark, sf_dir).count()

    # The test VM shows heavy vCPU-steal jitter (identical warmed jobs vary
    # 5×; round-3's driver run recorded a 3× across-the-board inflation that
    # a same-code rerun could not reproduce), so the headline number is the
    # min of three runs per query — the capability number, not the noise
    # draw.  Per-query medians are reported alongside so a reader can
    # separate steal-noise (min ≪ median) from real regressions (both move).
    try:
        runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    except ValueError:
        runs = 3
    # Steal gate (VERDICT r8 ask #6): a per-run sample counts as CLEAN
    # when the host stole < 0.5% of the run's CPU window.  Each query
    # retries (bounded) until it has at least one clean sample, and the
    # sum of per-query clean minima is emitted as `clean_total` — the
    # first-class cross-round number; `steal_dirty` names any query
    # that never got a clean window so a reader knows exactly which
    # entries of `queries_clean` fell back to a stolen sample.
    clean_frac = 0.005
    try:
        extra = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "4")))
    except ValueError:
        extra = 4
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    cleans: dict[str, float] = {}
    steal_dirty: list[str] = []
    query_steal: dict[str, float] = {}
    load_start = _loadavg()
    cpu_start = _cpu_sample()
    for name in names:
        samples = []
        clean_samples = []
        steal = []
        attempts = 0
        while attempts < runs or (not clean_samples and attempts < runs + extra):
            attempts += 1
            # Cold-equivalent repeats (VERDICT r14 ask #2): a few
            # operators share an in-query relation via plain persist(),
            # and Spark's CacheManager dedupes by logical plan — so
            # without this, runs 2..n of a repeat read the previous
            # run's cache and the min-of-3 reports a warm number.
            # Clearing BETWEEN runs (outside the timed window) makes
            # every sample compute from the parquet inputs; in-query
            # reuse within one run is untouched.
            spark.catalog.clearCache()
            c0 = _cpu_sample()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            elapsed = time.time() - t0
            samples.append(elapsed)
            d = _cpu_delta(c0, _cpu_sample())
            if d is not None:
                steal.append(d["steal_sec"])
                if d["steal_frac"] < clean_frac:
                    clean_samples.append(elapsed)
        samples.sort()
        timings[name] = round(samples[0], 3)
        medians[name] = round(samples[len(samples) // 2], 3)
        if clean_samples:
            cleans[name] = round(min(clean_samples), 3)
        else:
            steal_dirty.append(name)
            cleans[name] = timings[name]
        if steal:
            query_steal[name] = round(sum(steal), 3)

    # Dirty-set retry sweeps (VERDICT r12 ask #6): queries that never
    # got a clean window get whole extra passes at the END of the run
    # (steal bursts are temporally clustered — retrying later beats
    # retrying immediately).  Whatever is STILL dirty after the sweeps
    # is EXCLUDED from clean_total, with the exclusion named in the
    # record, so the committed number is never a stolen sample.
    try:
        sweeps = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_SWEEPS",
                                           "2")))
    except ValueError:
        sweeps = 2
    for _sweep in range(sweeps):
        if not steal_dirty:
            break
        still = []
        for name in steal_dirty:
            spark.catalog.clearCache()  # cold-equivalent, as in the main loop
            c0 = _cpu_sample()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            elapsed = time.time() - t0
            d = _cpu_delta(c0, _cpu_sample())
            if d is not None:
                query_steal[name] = round(
                    query_steal.get(name, 0.0) + d["steal_sec"], 3)
            if d is not None and d["steal_frac"] < clean_frac:
                cleans[name] = round(min(cleans[name], elapsed), 3)
                timings[name] = round(min(timings[name], elapsed), 3)
            else:
                still.append(name)
        steal_dirty = still
    excluded = list(steal_dirty)
    for name in excluded:
        cleans.pop(name, None)

    bench_window = _cpu_delta(cpu_start, _cpu_sample())
    env = {
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "cpus": os.cpu_count(),
        "bench_window": bench_window,
        "queries_steal_sec": query_steal,
    }
    window_dirty, window_dirty_reason = window_dirtiness(
        bench_window, clean_frac
    )
    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "median_total": round(sum(medians.values()), 3),
        "queries_clean": cleans,
        "clean_total": round(sum(cleans.values()), 3),
        "clean_total_excluded": excluded,
        "clean_total_note": (
            "clean_total sums per-query clean minima over "
            f"{len(cleans)} queries; {len(excluded)} never produced a "
            "clean window and are EXCLUDED (named in "
            "clean_total_excluded)" if excluded else
            "clean_total sums per-query clean minima; no exclusions"),
        "steal_dirty": steal_dirty,
        "window_dirty": window_dirty,
        "window_dirty_reason": window_dirty_reason,
        "env": env,
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The full record also lands in a side file: the driver captures
    # only a byte-bounded TAIL of stdout, which truncated the r9 record
    # mid-JSON.  The full line prints FIRST (humans/logs), then a
    # compact contract-shaped line prints LAST so the tail window
    # always ends with parseable JSON.  A DIRTY window writes to
    # BENCH_FULL_DIRTY.json so a polluted run can never clobber the
    # canonical steal-clean artifact (VERDICT r13 finding #3); override
    # with $SPARK_GRAFT_BENCH_OUT.
    out_name = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        "BENCH_FULL_DIRTY.json" if window_dirty else "BENCH_FULL.json",
    )
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), out_name
    )
    try:
        with open(full_path, "w") as f:
            json.dump(record, f)
            f.write("\n")
    except OSError:
        full_path = None
    print(json.dumps(record))
    print(json.dumps(compact_record(record)))


def compact_record(record: dict) -> dict:
    """The LAST stdout line, shaped for the driver's byte-bounded tail
    capture.  r13's full-record line got its head clipped by that
    window and the round-over-round comparison was lost (VERDICT r14
    finding #3), so the compact line must stay well under the capture
    window even as the catalog grows: steal-dirty query NAMES are
    folded to a count (the names live in the full record / side file)
    and nothing nested beyond the contract-required ``queries`` dict is
    emitted.  ``tests/test_bench_contract.py`` pins the byte budget."""
    return {
        "metric": record["metric"],
        "value": record["value"],
        "unit": record["unit"],
        "queries": record["queries_median"],
        "clean_total": record["clean_total"],
        "n_steal_dirty": len(record["steal_dirty"]),
        "window_dirty": record["window_dirty"],
        "sf": record["sf"],
    }


if __name__ == "__main__":
    main()
