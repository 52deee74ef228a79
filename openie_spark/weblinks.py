"""Web link-graph extraction — anchors, href resolution, URL
canonicalization: the operators that turn a crawled page table into the
(src_url, dst_url, anchor_text) edge list an entity-linking or
page-authority stage (graph_analytics.pagerank_micros) consumes.

Reference scope note: the reference (sudoandros/OpenIE) keys everything
by url (relations.py outputs carry the source url) but never parses
links; this is the web-graph layer a Common-Crawl-scale KG needs.

Everything is pure JVM regexp/string column expressions — link
extraction is a narrow map over the page scan, no shuffle, no UDF; the
DuckDB oracle re-implements the same contracts in RE2, so the rules
are pinned cross-engine.

Scope contracts (deliberately narrow, documented over clever):
- ``extract_anchors``: ``<a ... href="...">...</a>`` with DOUBLE-quoted
  hrefs only (the overwhelming production form); anchor text is
  tag-stripped and whitespace-collapsed. Malformed/unquoted hrefs are
  skipped, not guessed.
- ``resolve_href``: absolute http(s) kept; ``//host/..`` gets the base
  scheme; ``/path`` gets the base origin; other RELATIVE paths join
  against the base directory WITHOUT dot-segment elimination;
  ``mailto:``/``javascript:``/``tel:``/``data:`` and pure-fragment
  hrefs resolve to NULL (not links). This matches urllib.parse.urljoin
  on the dot-free subset (pytest pins it case by case).
- ``normalize_url``: strip fragment, lowercase scheme+host, drop
  default ports (``:80`` http / ``:443`` https), remove tracking
  params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``), tidy the
  leftover ``?``/``&`` artifacts. Path case and trailing slashes are
  preserved — they are semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# one pattern, two capture groups — extracting group 1 and group 2 with
# the SAME pattern yields positionally aligned arrays
_ANCHOR_RE = r'(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'
_SKIP_SCHEMES = r"^(mailto:|javascript:|tel:|data:)"
_TRACKING = r"(utm_[^&=#]*|fbclid|gclid|msclkid)"


def extract_anchors(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Explode every ``<a href="...">`` of each page into (url_col,
    link_no, href, anchor_text): link_no is the 0-based in-page
    position (stable provenance), anchor_text is tag-stripped and
    whitespace-collapsed. Pages without links produce no rows."""
    html = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 1)
    texts = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 2)
    pair = F.posexplode(F.arrays_zip(hrefs.alias("h"), texts.alias("t")))
    return df.select(
        url_col, pair.alias("link_no", "_a")
    ).select(
        url_col,
        F.col("link_no").cast("long"),
        F.col("_a.h").alias("href"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("_a.t"), r"<[^>]*>", " "),
                r"\s+",
                " ",
            )
        ).alias("anchor_text"),
    )


def _origin(url: F.Column) -> F.Column:
    """scheme://host[:port] of an absolute url."""
    return F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)


def resolve_href(base: F.Column, href: F.Column) -> F.Column:
    """Absolutize ``href`` against ``base`` (see module contract);
    NULL for non-link schemes, empty, and pure-fragment hrefs."""
    h = F.trim(href)
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = _origin(base)
    # base directory: strip query/fragment, then cut after the last '/'
    # of the path (origin/ when the path is bare)
    base_nopath = F.regexp_replace(base, r"[?#].*", "")
    base_dir = F.when(
        F.regexp_extract(base_nopath, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*/)", 1) != "",
        F.concat(
            origin,
            F.regexp_extract(
                base_nopath, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*/)", 1
            ),
        ),
    ).otherwise(F.concat(origin, F.lit("/")))
    return (
        F.when(h == "", F.lit(None).cast("string"))
        .when(h.startswith("#"), F.lit(None).cast("string"))
        .when(h.rlike(_SKIP_SCHEMES), F.lit(None).cast("string"))
        .when(h.rlike(r"^[hH][tT][tT][pP][sS]?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(base_dir, h))
    )


def normalize_url(url: F.Column) -> F.Column:
    """Canonical form per the module contract — every step a plain
    regexp/string expression reproducible in RE2."""
    u = F.regexp_replace(url, r"#.*", "")  # fragment
    prefix = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    # lowercase scheme+host, drop default port
    low = F.lower(prefix)
    low = F.regexp_replace(low, r"^(http://[^/:?]*):80$", "$1")
    low = F.regexp_replace(low, r"^(https://[^/:?]*):443$", "$1")
    tail = u.substr(F.length(prefix) + 1, F.length(u))
    u = F.concat(low, tail)
    # tracking params (global), then delimiter tidy-up
    u = F.regexp_replace(u, r"([?&])" + _TRACKING + r"=[^&]*", "$1")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")
    return u


def anchor_dictionary(
    links: DataFrame,
    anchor_col: str = "anchor_text",
    dst_col: str = "dst_url",
    min_count: int = 1,
) -> DataFrame:
    """The classic anchor-text dictionary over a link graph — the
    entity-linking prior P(target | surface form) that Wikipedia-style
    linkers are bootstrapped from: for every (lowercased anchor,
    destination) pair, ``n_links`` (how often that text points there),
    ``n_total`` (how often the text links anywhere), and ``rank`` (1 =
    the anchor's most common target; ties broken by dst_url so the
    ranking is deterministic). The prior stays INTEGER (n_links,
    n_total) — the caller divides; the dictionary itself sits under
    the hash contract.

    Scale shape: one groupBy(anchor, dst) with map-side combine, then
    one anchor-partitioned window — two exchanges, both keyed on text
    columns that distribute well (anchor texts are near-unique in the
    tail); the hot-anchor head ("click here") is exactly what
    ``min_count`` and downstream caps are for."""
    anchor = F.trim(F.lower(F.col(anchor_col)))
    pairs = (
        links.filter(anchor != "")
        .groupBy(anchor.alias("anchor"), F.col(dst_col).alias("dst_url"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
    by_anchor = Window.partitionBy("anchor")
    ranked = pairs.select(
        "anchor",
        "dst_url",
        "n_links",
        F.sum("n_links").over(by_anchor).cast("long").alias("n_total"),
        F.row_number()
        .over(by_anchor.orderBy(F.desc("n_links"), F.asc("dst_url")))
        .cast("long")
        .alias("rank"),
    )
    return ranked.filter(F.col("n_links") >= min_count)


def host_of(url) -> F.Column:
    """Host (no port) of an absolute url column/expression. Applied to
    :func:`normalize_url` output the host is already lowercased."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1)


def host_rollup(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Per-host web-graph rollup over a (src_url, dst_url) link table —
    the crawl-curation dashboard row: for every host, how many pages it
    publishes, how it links out (total / same-host / distinct external
    hosts) and how the web links in (total inbound links / distinct
    external referrer hosts). Columns (host, n_pages, out_links,
    out_internal, out_hosts, in_links, in_hosts) — all bigint counts,
    so the rollup sits under the full value-hash contract.

    Scale shape: one narrow map derives (src_host, dst_host, internal);
    outbound and inbound are each ONE groupBy with map-side partial
    aggregation (the distinct-host counts plan as Spark's standard
    two-phase distinct Expand — per-partition dedup before the
    shuffle, so a mega-host's fan-in arrives pre-collapsed), then one
    full outer join on host. Hosts are the natural unit of crawl skew;
    everything here keys ON host, so a hot host is one reducer key with
    pre-aggregated partial rows, never a replicated join side."""
    sh = host_of(F.col(src_col))
    dh = host_of(F.col(dst_col))
    e = links.select(
        F.col(src_col).alias("_src"),
        sh.alias("_sh"),
        dh.alias("_dh"),
        (sh == dh).alias("_int"),
    )
    out = e.groupBy(F.col("_sh").alias("host")).agg(
        F.count_distinct("_src").cast("long").alias("n_pages"),
        F.count(F.lit(1)).cast("long").alias("out_links"),
        F.sum(F.col("_int").cast("long")).cast("long").alias("out_internal"),
        F.count_distinct(
            F.when(~F.col("_int"), F.col("_dh"))
        ).cast("long").alias("out_hosts"),
    )
    inn = e.groupBy(F.col("_dh").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("in_links"),
        F.count_distinct(
            F.when(~F.col("_int"), F.col("_sh"))
        ).cast("long").alias("in_hosts"),
    )
    zero = F.lit(0).cast("long")
    return (
        out.join(inn, "host", "full_outer")
        .select(
            "host",
            *[
                F.coalesce(F.col(c), zero).cast("long").alias(c)
                for c in (
                    "n_pages", "out_links", "out_internal",
                    "out_hosts", "in_links", "in_hosts",
                )
            ],
        )
    )


def url_filter_predicate(
    url_col: str = "url",
    allow_schemes: tuple = ("http", "https"),
    deny_hosts: tuple = (),
    deny_prefixes: tuple = (),
    allow_prefixes: tuple = (),
) -> F.Column:
    """Robots/crawl-policy style URL predicate as ONE boolean column
    expression: scheme whitelist, host blocklist, deny-prefix rules,
    and (when given) an allow-prefix whitelist. Deny beats allow, the
    robots.txt convention for equal-specificity conflicts here
    simplified to deny-first (document, don't guess).

    It is deliberately a PREDICATE, not a DataFrame op: applied
    directly after ``spark.read``, the startswith/equality parts push
    into the parquet/Iceberg scan (Catalyst emits StartsWith/In
    PushedFilters), so a 100 TB crawl prunes at the source instead of
    scanning and discarding — the plan-pinned reason this exists."""
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    keep = F.lower(scheme).isin(*[s.lower() for s in allow_schemes])
    if deny_hosts:
        keep = keep & ~host_of(u).isin(*list(deny_hosts))
    for p in deny_prefixes:
        keep = keep & ~u.startswith(p)
    if allow_prefixes:
        any_allow = F.lit(False)
        for p in allow_prefixes:
            any_allow = any_allow | u.startswith(p)
        keep = keep & any_allow
    return keep


def crawl_frontier(
    links: DataFrame,
    seen: DataFrame,
    per_host_cap: int = 100,
    dst_col: str = "dst_url",
    seen_col: str = "url",
) -> DataFrame:
    """The next crawl wave: (url, host, n_inlinks, rank) — distinct
    destination urls not yet in ``seen``, prioritized by inlink count
    (the cheapest useful importance prior) with a deterministic
    tiebreak on url, and CAPPED per host (politeness + spider-trap
    containment: one calendar-generating host cannot flood the wave).

    Scale shape: one groupBy(dst) with map-side combine (dedup +
    priority in the same pass), one anti-join against ``seen`` — both
    sides hash-partitioned on the url key, the standard frontier
    co-partitioning; at crawl scale keep ``seen`` bucketed on url so
    this join never re-shuffles the big side — then one per-host window
    whose output is bounded at hosts x cap rows. All outputs integer or
    string; rank ordering is (n_inlinks desc, url), fully
    deterministic."""
    if per_host_cap <= 0:
        raise ValueError("per_host_cap must be positive")
    cand = (
        links.groupBy(F.col(dst_col).alias("url"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inlinks"))
    )
    unseen = cand.join(
        seen.select(F.col(seen_col).alias("url")).distinct(),
        "url",
        "left_anti",
    ).withColumn("host", host_of(F.col("url")))
    w = Window.partitionBy("host").orderBy(
        F.desc("n_inlinks"), F.asc("url")
    )
    return (
        unseen.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank") <= per_host_cap)
        .select("url", "host", "n_inlinks", "rank")
    )


def link_graph(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, link_no, href, dst_url, anchor_text): extracted
    anchors with resolved + normalized destinations; non-link hrefs
    (mailto/js/fragment/empty) are dropped. src_url is normalized too,
    so the edge list keys consistently."""
    anchors = extract_anchors(df, url_col, html_col)
    dst = resolve_href(F.col(url_col), F.col("href"))
    return (
        anchors.withColumn("dst_url", dst)
        .filter(F.col("dst_url").isNotNull())
        .select(
            normalize_url(F.col(url_col)).alias("src_url"),
            "link_no",
            "href",
            normalize_url(F.col("dst_url")).alias("dst_url"),
            "anchor_text",
        )
    )
