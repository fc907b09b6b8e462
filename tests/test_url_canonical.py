"""canonicalize_url edge cases — fragment/port/tracking-param/slash
handling must be exact: this key decides which crawl records survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_spark.data.text import canonicalize_url


CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Site.COM:443/A/b/?utm_source=x&b=2&a=1#frag",
     "https://www.site.com/A/b?a=1&b=2"),
    ("http://site.com:80/path", "http://site.com/path"),
    ("http://site.com:8080/path", "http://site.com:8080/path"),
    ("https://site.com/", "https://site.com"),
    ("https://site.com/p?utm_campaign=z&fbclid=1&gclid=2&ref=home",
     "https://site.com/p"),
    ("https://site.com/p?z=1&y=2&z=0", "https://site.com/p?y=2&z=0&z=1"),
    # no query, no fragment, nothing to do
    ("https://site.com/a/b", "https://site.com/a/b"),
    # path case preserved, host case folded
    ("https://SITE.com/CaseSensitive", "https://site.com/CaseSensitive"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["u"])
    got = [r.c for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    want = [c for _, c in CASES]
    assert got == want
