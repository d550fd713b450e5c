"""Query-side planning: BM25 top-k over the built index.

Two paths, both returning (query_id, rank, doc_id, score [, url]):

  * optimized — lexicon lookup (driver-side isin pushdown: query terms are a
    handful of literals, so the postings scan is bucket-partition-pruned AND
    term-row-group-pruned by Catalyst/parquet), broadcast of query metadata
    onto the block rows, block-max WAND per (query, shard) group, global
    window merge of the k-row partials.
  * oracle — exhaustive DataFrame scoring over the staged posting rows
    (operators.topk.exhaustive_topk), used by tests and the driver gate.

All queries of a batch run in ONE Spark job — the engine amortizes scan and
shuffle across the whole query set (the reference instead paid a
Kafka+Postgres round trip per query; ref: src/router.py:91-127).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..operators.topk import TOPK_PARTIAL_SCHEMA, exhaustive_topk, make_wand_partial
from ..sources.catalog import Catalog


def _bound_factor(avgdl: float, avgdl_seg: float) -> float:
    """Upper-bound correction for blocks encoded against an older avgdl.

    The BM25 score part is increasing in avgdl, so avgdl/avgdl_seg >= the
    pointwise ratio; padded one ulp so that the float rounding of the
    extra multiply in block_max_score can never fall below a tied true
    score (the factor must be a TRUE float upper bound for strict-<
    pruning to preserve rank identity)."""
    f = max(1.0, float(avgdl) / float(avgdl_seg))
    return f if f == 1.0 else math.nextafter(f, math.inf)


def build_qmeta(
    spark: SparkSession, queries: dict[str, str], mode: str
) -> tuple[DataFrame, list[str]]:
    """(query_id, term, n_terms, mode) rows — one per DISTINCT query token —
    plus the driver-side term list (for isin pushdown)."""
    rows = []
    all_terms: set[str] = set()
    for qid, text in queries.items():
        toks = sorted(set(spec.tokenize(text)))
        all_terms.update(toks)
        for t in toks:
            rows.append((qid, t, len(toks), mode))
    df = spark.createDataFrame(
        rows, schema="query_id string, term string, n_terms int, mode string"
    )
    return df, sorted(all_terms)


def topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    mode: str = spec.MODE_DISJUNCTIVE,
    k: int = spec.TOP_K_DEFAULT,
    with_url: bool = False,
) -> DataFrame:
    """Optimized path: compressed postings + block-max WAND."""
    cat = Catalog(index_root)
    reg = cat.read_registry()
    avgdl = reg["avgdl"]
    qmeta, terms = build_qmeta(spark, queries, mode)
    if not terms:
        return spark.createDataFrame([], "query_id string, rank int, doc_id long, score double")

    lex = cat.read(spark, reg["lexicon_dir"]).filter(F.col("term").isin(terms))
    q = qmeta.join(lex.select("term", "idf"), "term")  # drops out-of-corpus terms

    # one scan per segment (extensions append segments; base-only = 1);
    # avgdl_seg is the global avgdl the segment's block_max_part was encoded
    # against — see the bound correction below
    seg_dfs = [
        cat.read(spark, seg["dir"])
        .filter(F.col("term").isin(terms))
        .withColumn(
            "bound_factor", F.lit(_bound_factor(avgdl, float(seg["avgdl"])))
        )
        for seg in reg["segments"]
    ]
    blocks = seg_dfs[0]
    for s in seg_dfs[1:]:
        blocks = blocks.unionByName(s)
    # block_max_score = idf * idf-free part, multiplied HERE with the same
    # float op order the scorer uses, so it is an exact upper bound for the
    # segment's own avgdl; the score part is increasing in avgdl, so when
    # the CURRENT global avgdl exceeds the segment's encode-time avgdl the
    # factor avgdl/avgdl_seg (>= their ratio pointwise) keeps the bound
    # exact-safe — and it is 1 whenever stats haven't drifted upward.
    # The factor itself is nextafter-padded (see _bound_factor) so float
    # rounding of the extra multiply can never land 1 ulp below a tied
    # score and break strict-< pruning's rank-identity guarantee.
    joined = blocks.join(F.broadcast(q), "term").withColumn(
        "block_max_score",
        F.col("idf") * F.col("block_max_part") * F.col("bound_factor"),
    )

    partials = joined.groupBy("query_id", "shard").applyInPandas(
        make_wand_partial(avgdl, k), schema=TOPK_PARTIAL_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
    if with_url:
        docmap = cat.read(spark, *reg.get("docmap_dirs", ["docmap"]))
        out = (
            docmap.join(F.broadcast(out), "doc_id")
            .select("query_id", "rank", "doc_id", "url", "score")
        )
    return out


def topk_oracle(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    mode: str = spec.MODE_DISJUNCTIVE,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """Oracle path: exhaustive scoring over posting rows recomputed from the
    staged tokens (the posting stream itself is never staged)."""
    from ..operators.index_build import posting_rows_df

    cat = Catalog(index_root)
    stats = cat.read_stats()
    reg = cat.read_registry()
    qmeta, terms = build_qmeta(spark, queries, mode)
    rows = posting_rows_df(
        cat.read(spark, *reg.get("token_dirs", ["tokens"])),
        reg["n_docs"],
        stats["n_shards"],
        stats["n_buckets"],
    ).select("term", "doc_id", "tf", "doc_len")
    return exhaustive_topk(rows, qmeta, reg["n_docs"], reg["avgdl"], k)
