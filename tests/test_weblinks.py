"""weblinks: anchor extraction, href resolution (cross-checked against
urllib.parse.urljoin on the dot-free subset the contract covers), URL
normalization rules, link-number provenance, and the shuffle-free plan."""

from urllib.parse import urljoin

from pyspark.sql import functions as F

from openie_spark.weblinks import (
    extract_anchors,
    link_graph,
    normalize_url,
    resolve_href,
)


def _one(spark, expr, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
    )
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_resolve_href_matches_urljoin_on_contract_subset(spark):
    base = "https://news.example.org/sub/dir/page1.html?x=1"
    cases = [
        "https://other.org/abs",
        "HTTP://Case.Org/Abs",
        "//cdn.example.net/x",
        "/rooted/path?q=2",
        "sub/page.html",
        "file.html?a=1",
    ]
    for href in cases:
        got = _one(
            spark, resolve_href(F.col("b"), F.col("h")), b=base, h=href
        )
        want = urljoin(base, href)
        # urljoin lowercases nothing either; scheme-relative keeps base
        # scheme — identical on this subset
        assert got == want, (href, got, want)
    # non-links -> NULL
    for href in ["", "#frag", "mailto:a@b.c", "javascript:void(0)",
                 "tel:+1234", "data:text/plain,x"]:
        got = _one(
            spark, resolve_href(F.col("b"), F.col("h")), b=base, h=href
        )
        assert got is None, href
    # bare-path base: relative joins against origin/
    got = _one(
        spark,
        resolve_href(F.col("b"), F.col("h")),
        b="https://a.org",
        h="x.html",
    )
    assert got == "https://a.org/x.html"


def test_normalize_url_rules(spark):
    cases = {
        "HTTPS://Example.COM:443/d/3?utm_source=f&ref=r#top":
            "https://example.com/d/3?ref=r",
        "http://UPPER.org:80/Keep/Case": "http://upper.org/Keep/Case",
        "https://a.org/p?utm_a=1&utm_b=2": "https://a.org/p",
        "https://a.org/p?fbclid=x": "https://a.org/p",
        "https://a.org/p?a=1&gclid=x&b=2": "https://a.org/p?a=1&b=2",
        "https://a.org:8443/p": "https://a.org:8443/p",  # non-default kept
        "https://a.org/p?": "https://a.org/p",
        "https://a.org/Path/": "https://a.org/Path/",  # path case+slash kept
    }
    for raw, want in cases.items():
        got = _one(spark, normalize_url(F.col("u")), u=raw)
        assert got == want, (raw, got, want)


def test_extract_anchors_and_link_graph(spark):
    html = (
        '<p>x</p><a href="/a">One</a>'
        '<a class="z" href="/b"><b>Two</b>  words</a>'
        "<a href='/single-quoted'>skipped</a>"
        '<a href="#f">frag</a>'
        '<A HREF="/C">Upper</A>'
    )
    df = spark.createDataFrame(
        [("https://h.org/d/p.html", html)], "url string, html string"
    )
    anchors = extract_anchors(df).collect()
    assert [
        (r["link_no"], r["href"], r["anchor_text"]) for r in anchors
    ] == [
        (0, "/a", "One"),
        (1, "/b", "Two words"),
        (2, "#f", "frag"),
        (3, "/C", "Upper"),
    ]
    edges = link_graph(df).collect()
    assert [(r["link_no"], r["dst_url"]) for r in edges] == [
        (0, "https://h.org/a"),
        (1, "https://h.org/b"),
        (3, "https://h.org/C"),
    ]
    assert all(r["src_url"] == "https://h.org/d/p.html" for r in edges)
    # binary html column works too (crawl tables store bytes)
    bdf = spark.createDataFrame(
        [("https://h.org/", bytearray(html, "utf8"))],
        "url string, html binary",
    )
    assert len(link_graph(bdf).collect()) == 3


def test_anchor_dictionary_counts_and_rank(spark):
    """anchor_dictionary: case-folded grouping, per-anchor totals,
    deterministic rank (n_links desc, dst_url asc), min_count filter,
    empty anchors dropped."""
    from openie_spark.weblinks import anchor_dictionary

    rows = [
        ("Apple", "https://a.org/apple"),
        ("apple", "https://a.org/apple"),
        ("APPLE", "https://a.org/fruit"),
        ("apple", "https://a.org/fruit"),
        ("apple", "https://a.org/abc"),
        ("pear", "https://a.org/pear"),
        ("", "https://a.org/empty"),
    ]
    # fruit n_links=3 (case-folded), apple 2, abc 1; anchor total 6
    rows.append(("Apple", "https://a.org/fruit"))
    df = spark.createDataFrame(rows, "anchor_text string, dst_url string")
    got = {
        (r["anchor"], r["dst_url"]): (r["n_links"], r["n_total"], r["rank"])
        for r in anchor_dictionary(df).collect()
    }
    assert got == {
        ("apple", "https://a.org/fruit"): (3, 6, 1),
        ("apple", "https://a.org/apple"): (2, 6, 2),
        ("apple", "https://a.org/abc"): (1, 6, 3),
        ("pear", "https://a.org/pear"): (1, 1, 1),
    }
    # min_count prunes the tail but totals still count the whole anchor
    got2 = {
        (r["anchor"], r["dst_url"])
        for r in anchor_dictionary(df, min_count=2).collect()
    }
    assert got2 == {
        ("apple", "https://a.org/apple"),
        ("apple", "https://a.org/fruit"),
    }


def test_link_graph_plan_is_narrow(spark):
    df = spark.createDataFrame(
        [("https://h.org/", '<a href="/x">y</a>')],
        "url string, html string",
    )
    plan = link_graph(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan

def test_host_rollup_hand_counted(spark):
    """host_rollup over a crafted link table, every cell hand-counted:
    internal vs external split, distinct external hosts both ways,
    pure-sink hosts (no pages) appear with zeroed outbound columns."""
    from openie_spark.weblinks import host_rollup

    links = spark.createDataFrame(
        [
            # a.com publishes 2 pages; p1 links out twice to b.org,
            # once internal; p2 links to b.org and c.net
            ("https://a.com/p1", "https://b.org/x"),
            ("https://a.com/p1", "https://b.org/y"),
            ("https://a.com/p1", "https://a.com/p2"),
            ("https://a.com/p2", "https://b.org/x"),
            ("https://a.com/p2", "https://c.net/z"),
            # b.org publishes 1 page linking back to a.com
            ("https://b.org/home", "https://a.com/p1"),
        ],
        "src_url string, dst_url string",
    )
    got = {
        r["host"]: (
            r["n_pages"], r["out_links"], r["out_internal"],
            r["out_hosts"], r["in_links"], r["in_hosts"],
        )
        for r in host_rollup(links).collect()
    }
    assert got == {
        "a.com": (2, 5, 1, 2, 2, 1),   # in: self p1->p2 + b.org->p1
        "b.org": (1, 1, 0, 1, 3, 1),
        "c.net": (0, 0, 0, 0, 1, 1),   # pure sink
    }


def test_host_rollup_port_and_case_handling(spark):
    """host_of strips ports and the rollup keys on the bare host; a
    host that appears only with a port still folds into one row."""
    from openie_spark.weblinks import host_rollup

    links = spark.createDataFrame(
        [
            ("https://a.com:8443/p", "https://a.com/q"),
            ("https://a.com/q", "https://b.org:8080/r"),
        ],
        "src_url string, dst_url string",
    )
    got = {
        r["host"]: (r["n_pages"], r["out_links"], r["out_internal"])
        for r in host_rollup(links).collect()
    }
    # port-stripped: a.com:8443 -> a.com, so both links are a.com's and
    # the first is internal
    assert got["a.com"] == (2, 2, 1)
    assert got["b.org"] == (0, 0, 0)

def test_crawl_frontier_cap_priority_and_seen(spark):
    """crawl_frontier: seen urls excluded, duplicates collapsed with
    inlink counts as priority, per-host cap enforced with the
    (n_inlinks desc, url) deterministic order."""
    import pytest as _pytest

    from openie_spark.weblinks import crawl_frontier

    links = spark.createDataFrame(
        [
            ("https://a.com/p", "https://b.org/hot"),
            ("https://a.com/q", "https://b.org/hot"),
            ("https://a.com/p", "https://b.org/warm"),
            ("https://a.com/p", "https://b.org/cold1"),
            ("https://a.com/q", "https://b.org/cold2"),
            ("https://a.com/p", "https://c.net/x"),
            ("https://a.com/p", "https://a.com/q"),  # already seen
        ],
        "src_url string, dst_url string",
    )
    seen = spark.createDataFrame(
        [("https://a.com/p",), ("https://a.com/q",)], "url string"
    )
    got = {
        r["url"]: (r["host"], r["n_inlinks"], r["rank"])
        for r in crawl_frontier(links, seen, per_host_cap=3).collect()
    }
    # b.org capped at 3: hot(2) then cold1/cold2/warm by url asc -> cold1, cold2
    assert got == {
        "https://b.org/hot": ("b.org", 2, 1),
        "https://b.org/cold1": ("b.org", 1, 2),
        "https://b.org/cold2": ("b.org", 1, 3),
        "https://c.net/x": ("c.net", 1, 1),
    }
    with _pytest.raises(ValueError):
        crawl_frontier(links, seen, per_host_cap=0)

def test_url_filter_predicate_rules_and_pushdown(spark, tmp_path):
    """url_filter_predicate: scheme whitelist, host blocklist, deny
    beats allow; and the startswith parts PUSH into a parquet scan
    (PushedFilters shows StartsWith) — the at-scale point."""
    from openie_spark.weblinks import url_filter_predicate

    rows = [
        ("https://ok.com/a/1",),
        ("http://ok.com/a/2",),
        ("ftp://ok.com/a/3",),                  # scheme denied
        ("https://bad.com/a/4",),               # host denied
        ("https://ok.com/private/5",),          # prefix denied
        ("https://ok.com/b/6",),                # not in allow prefixes
    ]
    df = spark.createDataFrame(rows, "url string")
    pred = url_filter_predicate(
        deny_hosts=("bad.com",),
        deny_prefixes=("https://ok.com/private/",),
        allow_prefixes=("https://ok.com/a/", "http://ok.com/a/"),
    )
    got = {r["url"] for r in df.filter(pred).collect()}
    assert got == {"https://ok.com/a/1", "http://ok.com/a/2"}

    # pushdown: allow-prefix startswith reaches the parquet scan
    p = str(tmp_path / "urls")
    df.write.parquet(p)
    scan = spark.read.parquet(p).filter(
        url_filter_predicate(allow_prefixes=("https://ok.com/",))
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan, plan[:2000]
