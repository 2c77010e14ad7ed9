"""URL / domain curation operators for web-scale training-data pipelines:
URL canonicalization, canonical-URL dedup, and per-domain corpus stats.

The CommonCrawl-style curation step that runs BEFORE content dedup: the
same page is typically fetched under many URL spellings (scheme/host case,
default ports, `www.`, tracking parameters, parameter order, trailing
slashes, fragments), and collapsing those spellings first makes the
downstream content-dedup join sets much smaller.

Everything here is a single JVM-side Column expression per row — no Python,
no UDFs, no shuffle for canonicalization itself; `url_dedup` /
`domain_stats` are one hash-aggregation each. Every rule is expressible in
ANSI-ish SQL, so the driver-contract queries carry full DuckDB value
oracles. Regexes stay inside the Java∩RE2 portable subset (same policy as
text.token_count_bpe).

Reference scope note: the pandas reference has no web-curation analog; this
module is part of the BASELINE.json large-scale-pipeline extension surface
(same tier as dedup.py/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters dropped during canonicalization (public lists: UTM
# campaign tags + the common click-id params; case-insensitive — trackers
# emit both spellings). Kept deliberately short and documented —
# canonicalization must be auditable, not clever.
TRACKING_PARAM_RE = r"(?i)^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid)="

# Fallback used when a URL has no scheme://host shape at all: canonical form
# is NULL (quarantine, don't guess).
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical spelling of an absolute http(s)-style URL, as ONE nested
    Column expression (whole-stage-codegen friendly, zero Python).

    Rules, in order (each chosen because two spellings differing only by
    that rule fetch the same resource):

    1. strip the fragment (``#...`` never reaches the server);
    2. lowercase the scheme and the host (DNS is case-insensitive);
    3. drop a leading ``www.`` label;
    4. drop the scheme's default port (``:80`` for http, ``:443`` https);
    5. drop tracking query parameters (:data:`TRACKING_PARAM_RE`);
    6. sort the surviving query parameters bytewise (order is almost never
       semantic; sorting makes spelling unique);
    7. strip trailing slashes from the path.

    URLs with no ``scheme://host`` shape canonicalize to NULL — quarantine
    rows for the caller to route, not silent passthrough.

    Deliberately NOT done: percent-decoding (decoding can change meaning:
    ``%2F`` vs ``/``), registrable-domain extraction via the Public Suffix
    List (a data file, not an algorithm — see :func:`domain_of`), and
    userinfo handling (``user:pass@host`` passes through inside the
    lowered authority — userinfo is vanishingly rare in corpus URLs and
    case-sensitive per RFC 3986, so no transform is safe; crawl pipelines
    typically drop such URLs upstream).
    """
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(no_frag, _SCHEME_RE + r"([^/?#]*)", 2))
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        hostport.substr(F.lit(1), F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        hostport.substr(F.lit(1), F.length(hostport) - 4),
    ).otherwise(hostport)
    path = F.regexp_replace(
        F.regexp_extract(no_frag, _SCHEME_RE + r"[^/?#]*([^?#]*)", 2), r"/+$", ""
    )
    qs = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, q_part))


def domain_of(url: Column | str) -> Column:
    """Host of an absolute URL: lowercased, ``user:pass@`` userinfo and
    ``www.`` stripped, port dropped. This is the HOST, not the PSL
    registrable domain — correct per-site grouping for single-label hosts
    and good enough for quota enforcement; swapping in a Public Suffix
    List broadcast join is a data problem, not a code change (documented
    limitation)."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(F.regexp_extract(u, _SCHEME_RE + r"([^/?#]*)", 2))
    hostport = F.regexp_replace(hostport, r"^[^@/]*@", "")
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    return F.regexp_replace(hostport, r":[0-9]+$", "")


# Entity decode order matters: named/numeric entities first, `&amp;` LAST —
# decoding `&amp;` first would turn `&amp;lt;` into `&lt;` and then a second
# pass into `<` (double-decode). This is single-pass standard behavior.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(html: Column | str) -> Column:
    """Visible text of an HTML document — the boilerplate-strip step a
    web-corpus pipeline runs before any text-quality filtering. One chain
    of JVM-side regexp/replace passes (no Python, no parser state):

    1. drop ``<script>``/``<style>`` elements WITH their contents
       (case-insensitive, dot-matches-newline — ``(?is)``, non-greedy);
    2. drop HTML comments;
    3. replace every remaining tag with a space (block boundaries must not
       glue words together);
    4. decode the common entities (:data:`HTML_ENTITIES`, ``&amp;`` last);
    5. collapse whitespace runs and trim.

    Deliberately regex-based, not a DOM parse: at 100 TB the extraction
    must be a narrow streaming map over the scan, and the regexes stay in
    the Java∩RE2 portable subset so the driver contract's DuckDB oracle
    replays the chain verbatim. A full CDATA/nested-template-aware parser
    is a quality upgrade, not a shape change."""
    h = F.col(html) if isinstance(html, str) else html
    # dropped elements are replaced by a SPACE, not '': text on either side
    # of an invisible element must not glue into one word
    h = F.regexp_replace(h, r"(?is)<script[^>]*>.*?</script>", " ")
    h = F.regexp_replace(h, r"(?is)<style[^>]*>.*?</style>", " ")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    h = F.regexp_replace(h, r"<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        h = F.replace(h, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(h, r"\s+", " "))


def html_text_density(html: Column | str, text: Column) -> Column:
    """Extracted-text-to-markup ratio — the classic boilerplate signal
    (low density → navigation/chrome page, drop candidate)."""
    h = F.col(html) if isinstance(html, str) else html
    return F.length(text).cast("double") / F.greatest(
        F.length(h).cast("double"), F.lit(1.0)
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse URL spellings: one row per canonical URL with the minimum
    id as survivor plus the collapse count. ONE hash aggregation (map-side
    partial combine) on the canonical string — the at-scale shape; no
    window, no join. NULL canonicals (unparseable URLs) are excluded —
    route them through the quarantine path, never merge them into one
    giant NULL group (a classic skew bomb at 100 TB)."""
    canon = canonicalize_url(url_col).alias("canonical_url")
    return (
        df.select(F.col(id_col), canon)
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_spellings"),
        )
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", weight_col: str | None = None
) -> DataFrame:
    """Per-domain corpus share: row count (and optional weight sum) per
    host plus the fraction of the corpus it contributes. Two aggregations
    (per-domain, then a 1-row broadcast total) — the same shape as
    sampling.weighted_mix; the total join is a broadcast of one row, not a
    window over the whole corpus."""
    cols = [domain_of(url_col).alias("domain")]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if weight_col is not None:
        cols.append(F.col(weight_col))
        aggs.append(F.sum(weight_col).cast("long").alias("total_weight"))
    base = df.select(*cols).where(F.col("domain") != "")
    per = base.groupBy("domain").agg(*aggs)
    total = per.agg(F.sum("n_docs").alias("_total"))
    return per.join(F.broadcast(total)).select(
        "domain",
        *([c for c in per.columns if c not in ("domain",)]),
        (F.col("n_docs") / F.col("_total")).alias("corpus_share"),
    )
