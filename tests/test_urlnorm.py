"""URL canonicalization — functions/webtext.normalize_urls /
latest_snapshot.

normalize_urls' contract (docstring): lowercase scheme+host, strip the
scheme's default port, strip trailing path slashes, drop the fragment,
drop tracking params, sort surviving params bytewise.  Checked against a
character-exact pure-Python reimplementation over a URL zoo, then
latest_snapshot semantics on a small snapshot table.
"""

import re

from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.webtext import (
    TRACKING_PARAM_RE,
    latest_snapshot,
    normalize_urls,
)


def _py_norm(url):
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", url)
    scheme = (m.group(1) if m else "").lower()
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", url)
    hostport = (m.group(1) if m else "").lower()
    if scheme == "http":
        hostport = re.sub(r":80$", "", hostport)
    elif scheme == "https":
        hostport = re.sub(r":443$", "", hostport)
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = re.sub(r"/+$", "", m.group(1) if m else "")
    m = re.search(r"\?([^#]*)", url)
    query = m.group(1) if m else ""
    kept = sorted(
        p for p in query.split("&") if p and not re.match(TRACKING_PARAM_RE, p)
    )
    return (
        f"{scheme}://{hostport}{path}" + (f"?{'&'.join(kept)}" if kept else "")
    )


URLS = [
    "https://www.Example.COM/a/b?b=2&a=1",
    "HTTPS://WWW.EXAMPLE.COM:443/a/b/?a=1&b=2#frag",
    "http://example.com:80/",
    "http://example.com:8080/x",          # non-default port kept
    "https://example.com:80/x",           # :80 on https is NOT default -> kept
    "https://site.org/path?utm_source=f&utm_medium=m&q=1",
    "https://site.org/path?q=1",
    "http://a.b/p?gclid=xyz&fbclid=abc&ref=home",
    "http://a.b/p",
    "https://x.y/deep///",
    "https://x.y",
    "ftp://Files.Example.com:21/pub/",    # unknown scheme: port kept
    "https://h.io/?z=9&y=8&z=1",          # duplicate names sort bytewise
    "https://h.io/?refresh=1",            # 'refresh' is NOT 'ref'
    "garbage-no-scheme/path?a=1",
]


def test_matches_python_reimplementation(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = {r.url: r.norm_url for r in normalize_urls(df).collect()}
    for u in URLS:
        assert got[u] == _py_norm(u), (u, got[u], _py_norm(u))


def test_variants_collapse_to_one_key(spark):
    variants = [
        "https://www.Example.COM/a/b?b=2&a=1",
        "HTTPS://WWW.EXAMPLE.COM:443/a/b/?a=1&b=2#frag",
        "https://www.example.com/a/b/?utm_source=x&b=2&a=1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    norms = {r.norm_url for r in normalize_urls(df).collect()}
    assert norms == {"https://www.example.com/a/b?a=1&b=2"}


def test_latest_snapshot_keeps_freshest(spark):
    rows = [
        ("k1", 10, "a"), ("k1", 30, "b"), ("k1", 20, "c"),
        ("k2", 5, "d"),
        ("k3", 7, "e"), ("k3", 7, "f"),  # ts tie -> tie_col desc
    ]
    df = spark.createDataFrame(rows, "norm_url string, warc_ts long, payload string")
    out = {
        r.norm_url: (r.payload, r.n_snapshots)
        for r in latest_snapshot(df, tie_col="payload").collect()
    }
    assert out == {"k1": ("b", 3), "k2": ("d", 1), "k3": ("f", 2)}


def test_one_exchange_plan(spark):
    """latest_snapshot's two windows share one partitioning: exactly one
    Exchange in the physical plan."""
    df = spark.createDataFrame(
        [("k", 1, "x")], "norm_url string, warc_ts long, payload string"
    )
    plan = latest_snapshot(df, tie_col="payload")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
