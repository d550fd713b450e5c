"""Web-link-graph operators — functions/linkgraph.

extract_links on crafted HTML (the synthetic corpus' anchors carry no
href by byte-identity design, so extraction is exercised on explicit
pages); degree_stats and pagerank against a from-scratch pure-Python
power iteration implementing the exact docstring contract (no dangling
redistribution, multi-edge multiplicity, uniform init).
"""

from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.linkgraph import (
    degree_stats,
    extract_links,
    pagerank,
)

PAGES = [
    (
        "https://a.example/",
        b'<html><a href="https://b.example/x">b</a>'
        b'<div><a href="/rel">rel</a></div>'
        b'<img src="i.png"><a name="anchor-no-href">plain</a></html>',
    ),
    ("https://b.example/x", b"<html>no links here</html>"),
    (
        "https://c.example/",
        b'<a href="https://a.example/">back</a><a href="https://a.example/">again</a>',
    ),
]


def test_extract_links(spark):
    df = spark.createDataFrame(PAGES, "url string, html binary")
    got = [(r.src_url, r.dst_url) for r in extract_links(df).collect()]
    assert sorted(got) == [
        ("https://a.example/", "/rel"),
        ("https://a.example/", "https://b.example/x"),
        ("https://c.example/", "https://a.example/"),
        ("https://c.example/", "https://a.example/"),  # multi-edge kept
    ]


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (2, 3),  # (2,3) twice
    (5, 6),  # 6 is dangling (no outlinks)
]


def _py_pagerank(edges, n_iter=5, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    od = {}
    for u, _ in edges:
        od[u] = od.get(u, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        c = {v: 0.0 for v in nodes}
        for u, v in edges:
            c[v] += pr[u] / od[u]
        pr = {v: (1 - d) / n + d * c[v] for v in nodes}
    return pr


def test_degree_stats(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: (r.out_deg, r.in_deg) for r in degree_stats(df).collect()}
    assert got == {
        1: (2, 2), 2: (2, 1), 3: (1, 4), 4: (2, 0), 5: (1, 0), 6: (0, 1),
    }


def test_degree_stats_one_exchange(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    plan = degree_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_pagerank_matches_python_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.pr for r in pagerank(df, n_iter=5).collect()}
    want = _py_pagerank(EDGES, 5)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


def test_pagerank_mass_without_dangling_leak(spark):
    # a 3-cycle has no dangling nodes: total mass stays exactly 1
    cyc = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    got = pagerank(df, n_iter=8).agg(F.sum("pr")).collect()[0][0]
    assert abs(got - 1.0) < 1e-9
    # and by symmetry every node holds 1/3
    for r in pagerank(df, n_iter=8).collect():
        assert abs(r.pr - 1.0 / 3.0) < 1e-12
