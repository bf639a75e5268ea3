"""URL / domain curation operators for web-scale corpora.

Every CC-style training-data pipeline rolls documents up by where they
came from: extract the host from a URL, collapse it to the registrable
domain (the public-suffix boundary — ``foo.example.co.uk`` and
``bar.example.co.uk`` are the SAME publisher, ``example.co.uk``), rank
domains by volume/quality, and cap any one domain's contribution so a
single crawl-heavy site cannot dominate the corpus.

Spark-first design:

- :func:`url_host` / :func:`url_features` are pure Column expressions
  over Spark's built-in ``parse_url`` (JVM-side, whole-stage codegen;
  no Python in the hot path).
- :func:`registrable_domain` is a chained-``CASE`` longest-suffix match
  against a (small, user-extensible) public-suffix set — constant-folded
  per row, no join, no UDF.  The default set covers the common generic
  and two-level country suffixes; pass the full Mozilla public-suffix
  list as ``suffixes=`` for production crawls (still expression-only:
  it compiles to one CASE per suffix-*length*, not per suffix, because
  matching groups by label count via ``substring_index``).
- :func:`domain_stats` is ONE hash aggregation keyed by domain —
  map-side partial combine means the shuffle carries one row per
  (task, domain), so a 100 TB corpus with 10 M domains moves megabytes,
  not rows.
- :func:`domain_cap` is the deterministic per-group top-m shape
  (``row_number`` over a portable-hash order): Spark >= 3.5 plans it as
  WindowGroupLimit, so each task pre-trims to its local top-m before
  the single shuffle and no domain is ever materialized whole in one
  task.  The hash order makes the kept subset independent of row order
  and replayable by the SQL oracle.

Beyond-reference extension of the curation tier (reference pandera has
no URL tooling); sits next to ``operators/curation.py``'s per-``source``
caps and sampling.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash28

__all__ = [
    "DEFAULT_SUFFIXES",
    "url_host",
    "registrable_domain",
    "url_features",
    "domain_stats",
    "domain_cap",
    "domain_quality_gate",
    "domain_drift",
    "NONCONTENT_PATH_PATTERNS",
    "NONCONTENT_EXTENSIONS",
    "url_content_filter",
]

#: Compact public-suffix subset (generic TLDs + the common two-level
#: country suffixes).  Deliberately small: the full Mozilla list is
#: ~9 000 entries and belongs to the caller (``suffixes=`` accepts it
#: unchanged); this default keeps tests hermetic and the expression
#: tree shallow.
DEFAULT_SUFFIXES: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "dev", "app", "ai", "info", "biz", "xyz",
    "us", "uk", "de", "fr", "jp", "cn", "ru", "br", "in", "au",
    "ca", "nl", "se", "no", "es", "it", "pl", "eu",
)


def url_host(url: Column) -> Column:
    """Lower-cased host of ``url`` via Spark's built-in ``parse_url``
    (JVM expression; returns NULL for unparseable URLs — use it as the
    malformed-URL filter).  Ports and userinfo are excluded by
    ``try_parse_url('HOST')`` itself."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def registrable_domain(
    host: Column,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
) -> Column:
    """Registrable domain (public suffix + one label) of a host column.

    Longest-suffix-match against ``suffixes``: for a host
    ``a.b.example.co.uk`` with ``co.uk`` in the set, returns
    ``example.co.uk``.  A host that IS a bare suffix (or has no label
    left of the matched suffix) yields NULL — there is nothing
    registrable.  Hosts matching no suffix fall back to their last two
    labels (the standard heuristic for unknown TLDs); single-label
    hosts (``localhost``) yield NULL.

    Pure expression: suffixes are grouped by label count k (longest
    first); for each k one ``substring_index(host, '.', -k)`` is
    compared against the suffix set, and on match the domain is
    ``substring_index(host, '.', -(k+1))``.  No join, no UDF, folds
    into whole-stage codegen.
    """
    by_len: dict[int, list[str]] = {}
    for s in suffixes:
        by_len.setdefault(s.count(".") + 1, []).append(s.lower())
    labels = F.size(F.split(host, r"\."))
    out: Optional[Column] = None
    for k in sorted(by_len, reverse=True):
        tail = F.substring_index(host, ".", -k)
        matched = tail.isin(by_len[k])
        # the branch value handles registrability itself: a host that IS
        # the suffix (no label to its left) yields NULL here rather than
        # falling through to a SHORTER suffix match ("co.uk" must not
        # resolve via the bare "uk" entry)
        dom = F.when(labels > k, F.substring_index(host, ".", -(k + 1)))
        out = F.when(matched, dom) if out is None else out.when(
            matched, dom
        )
    fallback = F.when(labels >= 2, F.substring_index(host, ".", -2))
    return fallback if out is None else out.otherwise(fallback)


#: Query parameters that identify click-tracking URLs (public,
#: well-known marketing-tracker names).
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "msclkid", "mc_eid",
)


def url_features(
    df: DataFrame,
    url_col: str,
    *,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
    prefix: str = "url_",
) -> DataFrame:
    """Per-row URL structure features for quality filtering.

    Adds (all NULL-safe for malformed URLs, all JVM expressions):

    - ``{p}host``        lower-cased host
    - ``{p}domain``      registrable domain (:func:`registrable_domain`)
    - ``{p}is_https``    scheme == https
    - ``{p}path_depth``  number of non-empty path segments
    - ``{p}n_params``    number of ``&``-separated query parameters
    - ``{p}has_tracking``  any parameter name in :data:`TRACKING_PARAMS`
    - ``{p}host_labels``   dot-separated label count of the host

    Deep paths + tracking params correlate with boilerplate/SEO pages;
    typical gates are ``path_depth <= 6 AND NOT has_tracking``.
    """
    url = F.col(url_col)
    host = url_host(url)
    path = F.try_parse_url(url, F.lit("PATH"))
    query = F.try_parse_url(url, F.lit("QUERY"))
    has_q = query.isNotNull() & (query != "")
    params = F.split(query, "&")  # guarded by has_q at every use
    pnames = F.transform(
        params, lambda p: F.lower(F.substring_index(p, "=", 1))
    )
    p = prefix
    return df.select(
        "*",
        host.alias(f"{p}host"),
        registrable_domain(host, suffixes).alias(f"{p}domain"),
        (F.lower(F.try_parse_url(url, F.lit("PROTOCOL"))) == "https").alias(
            f"{p}is_https"
        ),
        F.size(
            F.filter(
                F.split(F.coalesce(path, F.lit("")), "/"),
                lambda s: s != "",
            )
        ).cast("int").alias(f"{p}path_depth"),
        F.when(has_q, F.size(params)).otherwise(F.lit(0))
        .cast("int").alias(f"{p}n_params"),
        F.when(
            has_q, F.exists(pnames, lambda nm: nm.isin(*TRACKING_PARAMS))
        ).otherwise(F.lit(False)).alias(f"{p}has_tracking"),
        F.when(
            host.isNotNull(), F.size(F.split(host, r"\."))
        ).cast("int").alias(f"{p}host_labels"),
    )


def domain_stats(
    df: DataFrame,
    url_col: str,
    *,
    quality_col: Optional[str] = None,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
    approx_hosts: bool = False,
) -> DataFrame:
    """Per-registrable-domain corpus rollup.

    One row per domain: ``domain, n_docs, n_hosts, share`` plus
    ``mean_quality`` when ``quality_col`` is given.  Malformed URLs
    (NULL host) land in the NULL-domain row so nothing is silently
    dropped.  ONE aggregation keyed by domain; ``share`` is a
    sum-over-window on the already domain-sized frame, so it costs one
    exchange of the DOMAIN frame, never the data.

    ``n_hosts`` defaults to EXACT ``countDistinct`` — Spark plans a
    two-phase aggregate keyed by (domain, host), so the shuffle
    carries one row per distinct (task, domain, host): correct at any
    size but it scales with distinct HOSTS.  For crawl-scale corpora
    (the 100 TB / 10M-domain case) pass ``approx_hosts=True``:
    ``approx_count_distinct`` merges HLL sketches map-side and the
    shuffle drops back to one row per (task, domain), at ±2-3%
    relative error on the host count (docs/share/quality stay exact).
    """
    url = F.col(url_col)
    host = url_host(url)
    dom = registrable_domain(host, suffixes)
    n_hosts = (
        F.approx_count_distinct(F.col("__host"))
        if approx_hosts
        else F.countDistinct(F.col("__host"))
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        n_hosts.cast("long").alias("n_hosts"),
    ]
    if quality_col is not None:
        aggs.append(F.avg(F.col(quality_col)).alias("mean_quality"))
    per = df.select(
        dom.alias("domain"), host.alias("__host"),
        *([quality_col] if quality_col else []),
    ).groupBy("domain").agg(*aggs)
    total = Window.partitionBy()
    return per.withColumn(
        "share",
        F.col("n_docs") / F.sum("n_docs").over(total),
    )


def domain_cap(
    df: DataFrame,
    url_col: str,
    *,
    max_per_domain: int,
    key_col: str,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
    salt: str = "",
    domain_out: Optional[str] = None,
) -> DataFrame:
    """Cap every registrable domain's contribution at
    ``max_per_domain`` documents, kept deterministically by the
    portable md5-prefix hash of ``key_col`` (+ ``salt``) — row-order
    independent, engine-replayable, re-drawable by changing the salt.

    Per-domain top-m via ``row_number`` over (hash, key): Spark >= 3.5
    plans the ``rn <= m`` filter as WindowGroupLimit, so each task
    keeps only its local top-m before the one shuffle on the domain
    key.  A skewed mega-domain therefore arrives pre-trimmed to
    ``m × n_tasks`` rows, not its full crawl.  Documents with NULL
    domain (malformed URL) are capped as their own group.

    ``domain_out`` optionally keeps the computed domain as a column.
    """
    dom = registrable_domain(url_host(F.col(url_col)), suffixes)
    keep_dom = domain_out or "__domain"
    h = portable_hash28(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(keep_dom).orderBy(h, F.col(key_col))
    out = (
        df.withColumn(keep_dom, dom)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(max_per_domain))
        .drop("__rn")
    )
    return out if domain_out else out.drop(keep_dom)


def domain_quality_gate(
    df: DataFrame,
    url_col: str,
    *,
    quality_col: str,
    min_quality: float,
    min_docs: int = 1,
    max_per_domain: Optional[int] = None,
    key_col: Optional[str] = None,
    salt: str = "",
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
    domain_out: Optional[str] = None,
) -> DataFrame:
    """The CC-curation end-to-end: keep documents whose registrable
    DOMAIN earns its place — mean ``quality_col`` at least
    ``min_quality`` over at least ``min_docs`` documents — then
    optionally cap each surviving domain at ``max_per_domain`` docs
    (deterministic portable-hash keep, as :func:`domain_cap`).
    Documents with an unparseable URL (NULL domain) are dropped: a
    gate that cannot attribute a document cannot vouch for it.

    Scale shape (deliberately NOT a per-domain window over the data):
    the verdict per domain comes from ONE domain-keyed hash
    aggregation (map-side partial combine — the shuffle carries one
    row per (task, domain)), and documents re-enter via a LEFT SEMI
    equi-join on the domain key, which AQE broadcasts when the
    passing-domain frame is small and skew-splits when it is not.  A
    window-based formulation would hand a crawl-heavy mega-domain to
    a single task; the optional cap window is safe because
    WindowGroupLimit pre-trims every task to its local top-m first.
    """
    dom = registrable_domain(url_host(F.col(url_col)), suffixes)
    keep_dom = domain_out or "__domain"
    tagged = df.withColumn(keep_dom, dom).where(
        F.col(keep_dom).isNotNull()
    )
    passing = (
        tagged.groupBy(keep_dom)
        .agg(
            F.count(F.lit(1)).alias("__nd"),
            F.avg(F.col(quality_col).cast("double")).alias("__mq"),
        )
        .where(
            (F.col("__mq") >= float(min_quality))
            & (F.col("__nd") >= int(min_docs))
        )
        .select(keep_dom)
    )
    kept = tagged.join(passing, on=keep_dom, how="left_semi")
    if max_per_domain is not None:
        if key_col is None:
            raise ValueError("max_per_domain requires key_col")
        h = portable_hash28(
            F.concat(F.col(key_col).cast("string"), F.lit(salt))
        )
        w = Window.partitionBy(keep_dom).orderBy(h, F.col(key_col))
        kept = (
            kept.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= int(max_per_domain))
            .drop("__rn")
        )
    return kept if domain_out else kept.drop(keep_dom)


def domain_drift(
    df: DataFrame,
    url_col: str,
    ts_col: str,
    value_col: str,
    edges: Sequence[float],
    *,
    grain: str = "day",
    min_docs: int = 1,
    suffixes: Sequence[str] = DEFAULT_SUFFIXES,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-domain quality-drift screen: for every registrable domain
    and time period, the PSI of the binned ``value_col`` distribution
    against that DOMAIN's all-time distribution — the crawl-ops
    question "which publisher's content changed, and when?".  Same
    exact-PSI convention as ``drift.psi_timeline`` (fixed ``edges``,
    eps-floored shares over the full period×bin grid), but keyed by
    domain so every join is an equi-join on the domain key — no
    broadcast crossJoin is needed because the baseline frames carry
    the key.

    Output: ``(domain, period, n_rows, psi)``; domains with fewer
    than ``min_docs`` total documents are screened out before the
    grid (thin domains produce noise-only PSI).  ONE
    (domain, period, bin) aggregation scans the data; everything
    downstream is arithmetic on that reduced grain.
    """
    from .drift import bin_column

    dom = registrable_domain(url_host(F.col(url_col)), suffixes)
    b = bin_column(F.col(value_col), edges)
    period = F.date_trunc(grain, F.col(ts_col))
    counts = (
        df.select(
            dom.alias("domain"), period.alias("period"), b.alias("bin")
        )
        .where(F.col("domain").isNotNull())
        .groupBy("domain", "period", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = counts.groupBy("domain", "bin").agg(
        F.sum("n").alias("__nb")
    )
    tot_b = base.groupBy("domain").agg(
        F.sum("__nb").cast("double").alias("__tot_b")
    ).where(F.col("__tot_b") >= float(min_docs))
    per_p = counts.groupBy("domain", "period").agg(
        F.sum("n").alias("__tot_p")
    )
    grid = (
        per_p.join(base, on="domain")
        .join(tot_b, on="domain")
    )
    j = grid.join(
        counts, ["domain", "period", "bin"], "left"
    ).withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    fa = F.greatest(
        F.col("n").cast("double") / F.col("__tot_p").cast("double"),
        F.lit(float(eps)),
    )
    fb = F.greatest(
        F.col("__nb").cast("double") / F.col("__tot_b"),
        F.lit(float(eps)),
    )
    term = (fa - fb) * F.log(fa / fb)
    return (
        j.groupBy("domain", "period")
        .agg(
            F.max("__tot_p").cast("long").alias("n_rows"),
            F.sum(term).alias("psi"),
        )
    )


#: Path segments that mark navigation / utility / machine pages rather
#: than content (the standard CC-curation blocklist shapes: listing
#: pages, auth flows, commerce chrome, feeds, CMS internals).
NONCONTENT_PATH_PATTERNS: tuple[str, ...] = (
    "tag", "tags", "category", "categories", "page", "search",
    "login", "signin", "signup", "register", "logout", "account",
    "cart", "checkout", "wishlist", "feed", "rss", "sitemap",
    "calendar", "archive", "archives", "print", "share",
    "wp-admin", "wp-json", "wp-login.php", "xmlrpc.php", "cgi-bin",
)

#: URL file extensions that are machine payloads, not prose.
NONCONTENT_EXTENSIONS: tuple[str, ...] = (
    "css", "js", "json", "xml", "rss", "atom", "ico", "svg",
    "png", "jpg", "jpeg", "gif", "webp", "mp3", "mp4", "zip",
    "gz", "tar", "exe", "dmg", "woff", "woff2", "ttf",
)

def url_content_filter(
    df: DataFrame,
    url_col: str,
    *,
    path_patterns: Sequence[str] = NONCONTENT_PATH_PATTERNS,
    extensions: Sequence[str] = NONCONTENT_EXTENSIONS,
    max_params: int = 8,
    max_path_depth: int = 8,
    flag_out: Optional[str] = None,
) -> DataFrame:
    """Crawl-list content screen: drop URLs whose SHAPE says
    "navigation / utility / machine page" before fetching or scoring
    the body — the cheapest filter in a CC-style pipeline because it
    needs only the URL string.

    A URL is non-content when any of:

    - a path SEGMENT equals one of ``path_patterns`` (segment-exact:
      ``/tag/x`` fires, ``/tagging-guide`` does not),
    - its last path segment has an extension in ``extensions``,
    - it carries more than ``max_params`` query parameters or a
      tracking parameter (see :data:`TRACKING_PARAMS`),
    - its path is deeper than ``max_path_depth`` segments (calendar /
      faceted-navigation explosions),
    - it is unparseable (NULL host).

    Pure Column expressions end to end (``parse_url`` + HOF
    ``exists`` over the split path — no regex backtracking, no UDF, no
    join; whole-stage codegen).  ``flag_out`` keeps the boolean and
    the fired-rule name instead of filtering, for audit sampling.
    """
    url = F.col(url_col)
    host = url_host(url)
    path = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")),
                              F.lit("")))
    query = F.try_parse_url(url, F.lit("QUERY"))
    has_q = query.isNotNull() & (query != "")
    params = F.split(query, "&")
    pnames = F.transform(
        params, lambda p: F.lower(F.substring_index(p, "=", 1))
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    pats = [p.lower() for p in path_patterns]
    exts = [e.lower() for e in extensions]
    # try_element_at: a root-path URL has ZERO segments and bare
    # element_at(-1) raises INVALID_ARRAY_INDEX under ANSI
    last_seg = F.try_element_at(segs, F.lit(-1))
    ext = F.when(
        last_seg.contains("."),
        F.lower(F.substring_index(last_seg, ".", -1)),
    )
    rules = [
        ("unparseable", host.isNull()),
        ("path_pattern", F.exists(segs, lambda s: s.isin(pats))),
        ("extension", ext.isin(exts)),
        (
            "params",
            F.when(
                has_q,
                (F.size(params) > int(max_params))
                | F.exists(pnames, lambda nm: nm.isin(*TRACKING_PARAMS)),
            ).otherwise(F.lit(False)),
        ),
        ("path_depth", F.size(segs) > int(max_path_depth)),
    ]
    fired = F.coalesce(
        *[F.when(cond, F.lit(name)) for name, cond in rules],
        F.lit(None).cast("string"),
    )
    if flag_out:
        return df.withColumn(
            flag_out, fired.isNotNull()
        ).withColumn(f"{flag_out}_rule", fired)
    return df.where(fired.isNull())
