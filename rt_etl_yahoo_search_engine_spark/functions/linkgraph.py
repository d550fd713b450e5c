"""Web-link-graph operators for crawl-scale corpora.

Link-based signals are a standard stage of web training-data pipelines
(RefinedWeb/CCNet-style URL quality filtering rides host-level link
metrics; Common Crawl publishes a webgraph for exactly this): extract
anchor edges from raw HTML, compute degree statistics, and run PageRank.
The reference engine stores raw SERP HTML per url
(src/models/dao_data_classes/raw_search_result.py) — these operators are
the corpus-level analysis pass over that same pages table.

All relational / JVM-side: edge extraction is one `regexp_extract_all`
projection (no UDF, no DOM walk — hrefs are attribute-local), degree
stats are ONE shuffle via the union trick, PageRank is the classic
join + groupBy iteration whose per-round cost is linear in |E|.

Input contracts:
  extract_links: pages(url: string, html: binary)
  degree_stats / pagerank: edges(src, dst) — any orderable node type;
  multi-edges contribute multiply (dedup upstream if undesired).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_RE = 'href="([^"]*)"'


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) — one row per href attribute in the page HTML,
    in document order.  Pure codegen: decode + regexp_extract_all +
    explode; pages without links emit no rows.  Compose with
    webtext.normalize_urls on dst_url before graph construction."""
    return pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.expr(f"regexp_extract_all(decode({html_col}, 'UTF-8'), '{HREF_RE}', 1)")
        ).alias("dst_url"),
    )


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, out_deg, in_deg) over the union of endpoints.

    ONE shuffle via the union trick — each edge becomes an (endpoint,
    is_out) pair and a single groupBy sums both degrees — instead of the
    naive two-agg + outer-join plan (two exchanges + a join)."""
    both = edges.select(
        F.col(src_col).alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionAll(
        edges.select(F.col(dst_col).alias("node"), F.lit(0), F.lit(1))
    )
    return both.groupBy("node").agg(
        F.sum("o").cast("long").alias("out_deg"),
        F.sum("i").cast("long").alias("in_deg"),
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, pr) — ``n_iter`` rounds of power iteration:

        pr_{t+1}(v) = (1 - d) / N  +  d * sum over edges (u, v) of
                      pr_t(u) / out_deg(u)

    over nodes = distinct(src ∪ dst), uniform init 1/N.  Dangling-node
    mass is NOT redistributed (it leaves the system — the simplest
    deterministic contract, and the one an exact SQL oracle can mirror);
    multi-edges contribute multiply.

    Scale shape: out-degrees join the edge list ONCE (edges_w, reused
    every round); each round is one join on src + one groupBy on dst —
    both linear in |E|, the canonical alternating-key shuffle pair.  At
    production scale persist/checkpoint pr between rounds and bucket
    edges by src so the per-round join is exchange-free on one side;
    here the 5-round lineage chain is evaluated once at the end.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .unionAll(edges.select(dst.alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = edges.groupBy(src.alias("_pr_src")).agg(
        F.count("*").cast("double").alias("_pr_od")
    )
    edges_w = (
        edges.select(src.alias("_pr_src"), dst.alias("_pr_dst"))
        .join(deg, "_pr_src")
        .persist()
    )
    base = (1.0 - damping) / n
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(int(n_iter)):
        contrib = (
            edges_w.join(pr, edges_w["_pr_src"] == pr["node"])
            .groupBy(F.col("_pr_dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("_pr_od")).alias("_pr_c"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + damping * F.coalesce("_pr_c", F.lit(0.0))).alias("pr"),
        )
    return pr
