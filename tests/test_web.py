"""URL canonicalization + domain stats (operators/web.py)."""

from __future__ import annotations

import pytest

from national_caseload_data_ingest_spark.operators.web import (
    _canonical_fields,
    domain_doc_counts,
    url_canonical_features,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(spark, url: str) -> dict:
    df = spark.createDataFrame([(0, url)], ["doc_id", "url"])
    return _canonical_fields(df).collect()[0].asDict()


def test_fragment_dropped_and_host_lowercased(spark):
    r = _canon(spark, "https://WWW.Example.COM/a/b?q=1#frag")
    assert r["canonical_url"] == "https://www.example.com/a/b?q=1"
    assert r["host"] == "www.example.com"
    assert r["registered_domain"] == "example.com"
    assert r["path_depth"] == 2
    assert r["has_query"] == 1


def test_default_port_stripped_explicit_kept(spark):
    assert (
        _canon(spark, "http://h.example.org:80/x")["canonical_url"]
        == "http://h.example.org/x"
    )
    assert (
        _canon(spark, "https://h.example.org:443/x")["canonical_url"]
        == "https://h.example.org/x"
    )
    r = _canon(spark, "http://h.example.org:8080/x")
    assert r["canonical_url"] == "http://h.example.org:8080/x"
    assert r["port"] == 8080
    # http on 443 is NON-default and must survive
    assert (
        _canon(spark, "http://h.example.org:443/x")["canonical_url"]
        == "http://h.example.org:443/x"
    )


def test_no_query_no_fragment_passthrough(spark):
    r = _canon(spark, "http://a.example.net/one")
    assert r["canonical_url"] == "http://a.example.net/one"
    assert r["has_query"] == 0
    assert r["path_depth"] == 1


def test_url_features_plan_is_narrow(spark):
    """Pure column algebra: no UDF (BatchEvalPython/ArrowEvalPython)
    and no Exchange in the per-doc projection."""
    df = url_canonical_features(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_domain_counts_single_shuffle(spark):
    df = domain_doc_counts(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    # COUNT(DISTINCT host) plans as the standard two-phase distinct
    # aggregate: partial on (domain, host) -> exchange -> partial on
    # domain -> exchange.  Both phases map-side combine first, so the
    # second shuffle carries at most |domain x host| rows.
    assert plan.count("Exchange") <= 2, plan
    rows = {r["registered_domain"]: r for r in df.collect()}
    assert len(rows) == 39  # 13 domains x 3 tlds
    total = sum(r["n_docs"] for r in rows.values())
    assert total == 500  # sf0.001 documents
    assert all(r["n_hosts"] <= 7 for r in rows.values())
