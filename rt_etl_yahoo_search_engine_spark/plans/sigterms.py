"""Significant terms — the vocabulary that CHARACTERIZES a query's match
set, not just the most frequent words in it (Elasticsearch's
``significant_terms`` aggregation; its default JLH heuristic):

    fg  = df_hits  / n_hits      (term's doc share inside the match set)
    bg  = df_corpus / n_docs     (term's doc share in the whole corpus)
    jlh = (fg − bg) · (fg / bg)

High jlh = common in the results AND rare in the corpus — "what is this
result set about".  The classic use is search analytics / query
expansion next to a hit list.

Plan shape at 100 TB:
  * match relation — plans/stats.match_docs: unit-local set algebra on
    decoded postings, (query_id, doc_id) rows only through the shuffle,
    tombstoned docs already excluded.
  * foreground counts — the staged tokens table joined to the match
    relation on doc_id: only the HIT docs' token rows survive the join
    (the probe side prunes scan-side), then a map-side-partial
    groupBy(query, term) count.  Nothing corpus-scale moves for a
    bounded match set; for match-everything queries the shuffle is the
    corpus's distinct (doc, term) relation — the honest lower bound for
    an exact answer (ES samples instead; a sampler can be layered on the
    match relation without changing this operator).
  * background counts — the lexicon's df column, a term-keyed join at
    vocab scale (AQE picks broadcast when the foreground vocabulary is
    small).
  * statistics use the INDEX-TIME corpus (registry n_docs, lexicon df):
    deleted docs keep counting until compaction purges them — the same
    Lucene semantics BM25 scoring follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..sources.catalog import Catalog
from .stats import match_docs


def significant_terms(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
    min_hits_df: int = 2,
) -> DataFrame:
    """(query_id, rank, term, df_hits, df_corpus, jlh): each query's top-k
    match-set terms by the JLH significance score, ties by term asc.
    min_hits_df drops terms seen in fewer hit docs (noise gate, ES's
    shard_min_doc_count)."""
    cat = Catalog(index_root)
    reg = cat.read_registry()
    n_docs = int(reg["n_docs"])

    matches = match_docs(spark, index_root, queries, mode=mode)
    n_hits = matches.groupBy("query_id").agg(F.count("*").alias("n_hits"))
    tokens = (
        cat.read(spark, *reg.get("token_dirs", ["tokens"]))
        .filter(F.col("term").isNotNull())
        .select("doc_id", "term")
    )
    fg = (
        tokens.join(matches, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("df_hits"))
        .filter(F.col("df_hits") >= min_hits_df)
    )
    bg = cat.read(spark, reg["lexicon_dir"]).select(
        "term", F.col("df").alias("df_corpus")
    )
    # fg/bg shares and JLH in the exact double op order the oracle uses
    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(n_hits), "query_id")
        .withColumn("fgs", F.col("df_hits") / F.col("n_hits"))
        .withColumn("bgs", F.col("df_corpus") / F.lit(float(n_docs)))
        .withColumn(
            "jlh", (F.col("fgs") - F.col("bgs")) * (F.col("fgs") / F.col("bgs"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jlh"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "term", "df_hits", "df_corpus", "jlh")
    )

TOKEN_SPLIT_EXPR = "filter(split(lower({c}), '[^a-z0-9]+'), x -> x != '')"


def significant_text(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    docs: DataFrame,
    text_col: str = "text",
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
    min_hits_df: int = 2,
    filter_duplicate_text: bool = False,
    dup_prefix_tokens: int = 64,
) -> DataFrame:
    """(query_id, rank, term, df_hits, df_corpus, jlh) — Elasticsearch's
    ``significant_text`` aggregation: significant_terms re-analyzing the
    RAW text of the match-set docs on the fly (no fielddata / staged
    tokens needed) with its signature ``filter_duplicate_text`` option —
    docs whose leading `dup_prefix_tokens` tokens duplicate an
    earlier-id match-set doc are removed from the foreground statistics
    (ES's de-bias for boilerplate/retweet storms), per query.

    Background statistics stay INDEX-TIME (lexicon df, registry n_docs)
    exactly like significant_terms.

    Plan shape: the match relation (unit-local set algebra) joins the
    doc-keyed text table once — only hit docs' text survives; tokens
    come from a codegen split+explode(array_distinct(...)), so fg
    counting shuffles (query, term) rows, never text.  Duplicate
    filtering is one window over match-set-scale rows keyed on the
    token-prefix string (at 100 TB key it on xxhash64(prefix) so the
    exchange carries 8-byte keys; the string key here keeps the oracle
    byte-exact).  ES only ever runs this agg on a SAMPLE of hits; a
    sampler_agg can be layered on the match relation without changing
    this operator.
    """
    cat = Catalog(index_root)
    reg = cat.read_registry()
    n_docs = int(reg["n_docs"])

    matches = match_docs(spark, index_root, queries, mode=mode)
    hit = matches.join(
        docs.select("doc_id", F.col(text_col).alias("_text")), "doc_id"
    ).withColumn("_toks", F.expr(TOKEN_SPLIT_EXPR.format(c="_text")))
    if filter_duplicate_text:
        prefix = F.array_join(
            F.slice("_toks", 1, int(dup_prefix_tokens)), " "
        )
        w = Window.partitionBy("query_id", prefix).orderBy(F.asc("doc_id"))
        hit = (
            hit.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    n_hits = hit.groupBy("query_id").agg(F.count("*").alias("n_hits"))
    fg = (
        hit.select(
            "query_id",
            F.explode(F.array_distinct("_toks")).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("df_hits"))
        .filter(F.col("df_hits") >= min_hits_df)
    )
    bg = cat.read(spark, reg["lexicon_dir"]).select(
        "term", F.col("df").alias("df_corpus")
    )
    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(n_hits), "query_id")
        .withColumn("fgs", F.col("df_hits") / F.col("n_hits"))
        .withColumn("bgs", F.col("df_corpus") / F.lit(float(n_docs)))
        .withColumn(
            "jlh", (F.col("fgs") - F.col("bgs")) * (F.col("fgs") / F.col("bgs"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jlh"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "term", "df_hits", "df_corpus", "jlh")
    )
