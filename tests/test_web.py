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


# -- HTML link graph --------------------------------------------------------

def test_link_extractor_exclusions_and_resolution():
    """The kernel must decode entities, resolve relative hrefs, keep
    uppercase <A HREF>, and drop nofollow / href-less anchors; the
    fragment-only link resolves to the page itself (excluded later by
    the self-link rule)."""
    import pandas as pd

    from national_caseload_data_ingest_spark.operators.web import (
        _extract_links_kernel,
    )

    n = 500
    i = 12  # i%3==0 -> relative link present; i%4==0 -> nofollow present
    out = pd.concat(
        _extract_links_kernel(n)(
            iter([pd.DataFrame({"doc_id": [i]})])
        ),
        ignore_index=True,
    )
    urls = list(out["resolved"])
    t1, t2, t3, t4 = (3 * i + 1) % n, (7 * i + 2) % n, (i + 1) % n, (5 * i) % n
    # entity-decoded query (&amp; -> &)
    assert (
        f"https://site{t1 % 50}.example.com/a/{t1}/page.html?src={i}&x=1"
        in urls
    )
    # uppercase <A HREF='...'>
    assert f"https://site{t2 % 50}.example.com/a/{t2}/page.html" in urls
    # relative ../ resolved against the page URL (source host kept)
    assert f"https://site{i % 50}.example.com/a/{t3}/page.html" in urls
    # nofollow excluded
    assert all(f"/a/{t4}/page.html" not in u for u in urls)
    # fragment-only -> self (fragment stripped)
    assert f"https://site{i % 50}.example.com/a/{i}/page.html" in urls
    assert all("#" not in u for u in urls)
    assert len(urls) == 4


def test_link_graph_aggregate_matches_driver_recompute(spark):
    from national_caseload_data_ingest_spark.operators.web import (
        html_link_graph,
    )

    got = {
        r.doc_id: (r.n_inlinks, r.n_src_hosts, r.n_query_inlinks,
                   r.n_offsite_inlinks)
        for r in html_link_graph(spark, "/root/testdata/sf0.001").collect()
    }
    n = 500
    links = []
    for i in range(n):
        links.append((i, (3 * i + 1) % n, 1, 0))
        links.append((i, (7 * i + 2) % n, 0, 0))
        if i % 3 == 0:
            links.append((i, (i + 1) % n, 0, 1))
    want: dict[int, list] = {}
    for src, tgt, has_q, is_rel in links:
        if src == tgt:
            continue
        e = want.setdefault(tgt, [0, set(), 0, 0])
        e[0] += 1
        e[1].add(src % 50)
        e[2] += has_q
        e[3] += 1 if is_rel and src % 50 != tgt % 50 else 0
    assert got == {
        t: (e[0], len(e[1]), e[2], e[3]) for t, e in want.items()
    }


def test_ip_cidr_filter_is_a_hash_join_and_matches_recompute(spark):
    from national_caseload_data_ingest_spark.operators.web import (
        _blocklist,
        ip_cidr_filter,
    )

    df = ip_cidr_filter(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the equi-join on the /8 bucket must plan as a broadcast HASH join,
    # never the nested-loop a naive BETWEEN range join produces
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {r.doc_id: (r.blocked, r.block_id) for r in df.collect()}
    blocks = _blocklist()
    for did in range(500):
        ip = (did * 2654435761) % (1 << 32)
        hit = next((b for b, s, e in blocks if s <= ip < e), None)
        assert got[did] == (hit is not None, hit), did
    # non-vacuity: both outcomes occur
    assert any(b for b, _ in got.values())
    assert any(not b for b, _ in got.values())


def test_blocklist_straddles_buckets():
    """The fixture must keep the /8-bucket expansion load-bearing."""
    from national_caseload_data_ingest_spark.operators.web import (
        _blocklist,
    )

    straddling = [
        b for b, s, e in _blocklist() if (s >> 24) != ((e - 1) >> 24)
    ]
    assert len(straddling) >= 5


# -- robots.txt --------------------------------------------------------------

def test_robots_group_selection():
    from national_caseload_data_ingest_spark.operators.web import (
        robots_rules,
    )

    txt = "\n".join([
        "User-agent: BadBot",
        "Disallow: /",
        "",
        "User-agent: ncd",
        "User-agent: other",   # successive UA lines share one group
        "Disallow: /x",
        "",
        "User-agent: *",
        "Disallow: /star",
    ])
    # longest matching agent token wins over *
    assert robots_rules(txt, "NCDbot/1.0") == [(False, "/x")]
    assert robots_rules(txt, "otherbot") == [(False, "/x")]
    assert robots_rules(txt, "somebody") == [(False, "/star")]
    # no * group and no match -> empty (allow everything)
    assert robots_rules("User-agent: a\nDisallow: /", "b") == []


def test_robots_longest_match_and_tiebreak():
    from national_caseload_data_ingest_spark.operators.web import (
        robots_decision,
    )

    rules = [(False, "/p/"), (True, "/p/ok/")]
    assert robots_decision(rules, "/p/ok/f")[0] is True
    assert robots_decision(rules, "/p/other")[0] is False
    assert robots_decision(rules, "/q") == (True, None)
    # equal length: allow wins (RFC 9309 §2.2.2)
    tie = [(False, "/aa"), (True, "/aa")]
    assert robots_decision(tie, "/aa/x")[0] is True
    tie_rev = [(True, "/aa"), (False, "/aa")]
    assert robots_decision(tie_rev, "/aa/x")[0] is True


def test_robots_wildcards_and_anchor():
    from national_caseload_data_ingest_spark.operators.web import (
        _pattern_matches,
    )

    assert _pattern_matches("/a/*/draft", "/a/7/draft")
    assert _pattern_matches("/a/*/draft", "/a/x/y/draft")
    assert not _pattern_matches("/a/*/draft", "/b/7/draft")
    assert _pattern_matches("/*.zip$", "/files/x.zip")
    assert not _pattern_matches("/*.zip$", "/files/x.zip.html")
    # regex metacharacters in patterns are literal
    assert _pattern_matches("/a+b", "/a+b/c")
    assert not _pattern_matches("/a+b", "/aab/c")


def test_robots_query_cases(spark):
    from national_caseload_data_ingest_spark.operators.web import (
        robots_txt_allow,
    )

    rows = {r.doc_id: r for r in
            robots_txt_allow(spark, "/root/testdata/sf0.001").collect()}
    # class 1 (disallowed by prefix) at doc 11: h=11
    r = rows[11]
    assert (r.allowed, r.rule) == (False, "/private11/")
    # class 2 (allow override) at doc 12: h=12
    r = rows[12]
    assert (r.allowed, r.rule) == (True, "/private12/public/")
    # class 4 (wildcard) at doc 14
    r = rows[14]
    assert (r.allowed, r.rule) == (False, "/a/*/draft")
    # class 0 (no match -> allowed) at doc 10
    r = rows[10]
    assert (r.allowed, r.rule, r.rule_len) == (True, None, 0)
