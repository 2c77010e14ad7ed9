"""URL / domain curation operators (operators/web.py)."""

from pyspark.sql import functions as F

from seronet_data_validator_spark.operators.web import (
    canonicalize_url,
    domain_of,
    domain_stats,
    url_dedup,
)

CASES = [
    # (raw, canonical, domain)
    (
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "https://example.com/a/b?a=1&b=2",
        "example.com",
    ),
    ("https://example.com/a/b?a=1&b=2", "https://example.com/a/b?a=1&b=2",
     "example.com"),
    # default port stripped only when it matches the scheme
    ("http://Example.com:80/a/b", "http://example.com/a/b", "example.com"),
    ("https://example.com:80/x", "https://example.com:80/x", "example.com"),
    ("http://example.com:8080/a/b", "http://example.com:8080/a/b",
     "example.com"),
    # no scheme://host shape -> NULL quarantine, empty domain
    ("not a url", None, ""),
    # bare host, no path
    ("https://example.com", "https://example.com", "example.com"),
    # all params tracking -> '?' dropped entirely
    ("https://sub.example.com/p?fbclid=zzz&utm_medium=m",
     "https://sub.example.com/p", "sub.example.com"),
    # runs of trailing slashes collapse with the root path
    ("http://www.example.com///", "http://example.com", "example.com"),
    # percent-encoding is preserved, never decoded
    ("https://example.com/a%2Fb?x=%20", "https://example.com/a%2Fb?x=%20",
     "example.com"),
    # fragment stripped even with empty query
    ("https://example.com/p?#sec", "https://example.com/p", "example.com"),
    # tracking params match case-insensitively; userinfo is stripped from
    # the DOMAIN but passes through the canonical authority (documented)
    ("https://example.com/p?UTM_Source=x&A=1",
     "https://example.com/p?A=1", "example.com"),
    ("https://user:PW@example.com:443/p",
     "https://user:pw@example.com/p", "example.com"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "i int, url string"
    )
    got = {
        r["i"]: (r["c"], r["d"])
        for r in df.select(
            "i",
            canonicalize_url("url").alias("c"),
            domain_of("url").alias("d"),
        ).collect()
    }
    for i, (_, canon, dom) in enumerate(CASES):
        assert got[i] == (canon, dom), f"case {i}: {CASES[i][0]!r} -> {got[i]}"


def test_canonicalize_idempotent(spark):
    """Canonical output re-canonicalizes to itself (fixpoint)."""
    df = spark.createDataFrame(
        [(raw,) for raw, canon, _ in CASES if canon is not None], "url string"
    )
    two = df.select(
        canonicalize_url("url").alias("c1"),
        canonicalize_url(canonicalize_url("url")).alias("c2"),
    )
    assert two.where(F.col("c1") != F.col("c2")).count() == 0


def test_url_dedup_collapses_spellings_and_quarantines_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x?b=2&a=1"),
            (2, "HTTPS://WWW.A.com:443/x/?a=1&b=2&utm_source=s#f"),
            (3, "https://a.com/y"),
            (4, "junk"),
            (5, "more junk"),
        ],
        "doc_id int, url string",
    )
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert set(out) == {"https://a.com/x?a=1&b=2", "https://a.com/y"}
    assert out["https://a.com/x?a=1&b=2"]["survivor_id"] == 1
    assert out["https://a.com/x?a=1&b=2"]["n_spellings"] == 2
    assert out["https://a.com/y"]["n_spellings"] == 1


def test_domain_stats_share_and_weight(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/1", 10),
            (2, "http://WWW.A.com/2", 30),
            (3, "https://b.com/1", 60),
            (4, "junk", 99),  # excluded: no domain
        ],
        "doc_id int, url string, w int",
    )
    out = {r["domain"]: r for r in domain_stats(df, weight_col="w").collect()}
    assert set(out) == {"a.com", "b.com"}
    assert out["a.com"]["n_docs"] == 2 and out["a.com"]["total_weight"] == 40
    assert out["b.com"]["n_docs"] == 1 and out["b.com"]["total_weight"] == 60
    assert abs(out["a.com"]["corpus_share"] - 2 / 3) < 1e-12
    assert abs(out["b.com"]["corpus_share"] - 1 / 3) < 1e-12


def test_html_to_text(spark):
    from seronet_data_validator_spark.operators.web import (
        html_text_density,
        html_to_text,
    )

    cases = [
        # script/style contents dropped, tags become spaces, ws collapsed
        (
            "<html><head><script>var x=1;\nalert('&amp;');</script>"
            "<style>.a{color:red}</style></head>"
            "<body><h1>Title</h1><p>a  b</p></body></html>",
            "Title a b",
        ),
        # comments dropped; entities decoded once, &amp; last (no
        # double-decode: &amp;lt; must become the literal string &lt;)
        (
            "<p>1 &lt; 2 &amp;&amp; 3 &gt; 2</p><!-- hidden --><p>&amp;lt;</p>",
            "1 < 2 && 3 > 2 &lt;",
        ),
        ("<div>a&nbsp;b&quot;c&#39;d</div>", "a b\"c'd"),
        # case-insensitive script match across newlines
        ("x<SCRIPT a=b>line1\nline2</ScRiPt>y", "x y"),
        ("plain text, no markup", "plain text, no markup"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text("html").alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"

    dens = (
        df.select(
            "i", html_text_density("html", html_to_text("html")).alias("d")
        )
        .where(F.col("i") == 4)
        .collect()[0]["d"]
    )
    assert dens == 1.0  # markup-free doc has density exactly 1


def test_canonicalization_is_jvm_only(spark):
    """The canonicalization plan contains no Python evaluation node — the
    100 TB contract for this operator is narrow JVM-side map work."""
    df = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = (
        df.select(canonicalize_url("url").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
