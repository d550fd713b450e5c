"""Federated search across several indexes with EXACT combined
statistics — Elasticsearch `dfs_query_then_fetch` / cross-cluster search
done right.

ES's default query_then_fetch scores each shard with its LOCAL df/avgdl,
so the same document ranks differently depending on which index it lives
in; dfs_query_then_fetch fixes it with a statistics pre-phase.  This
operator is that pre-phase + scatter-gather as a batch plan:

  1. stats phase (driver-side, metadata-scale): per index, registry
     (n_docs, sum_dl) plus a pruned lexicon df lookup for the query
     terms; combine into global N = sum n_docs, global avgdl =
     sum(sum_dl)/N, global df(term) = sum df — EXACT, not sampled.
  2. scatter: plans/bm25.topk per index with idf/avgdl OVERRIDDEN by the
     global values (local term presence still gates conjunctive
     semantics — a term absent from an index matches no doc there).
     Each index's per-(query, shard) top-k partials stay scan-side; only
     k narrow rows per (query, index) reach the merge.
  3. gather: union + one result-scale global window (score DESC,
     index ASC, doc_id ASC).

RANK IDENTITY: because tf and doc_len are per-document and idf/avgdl are
the global values, every document's federated score EQUALS its score in
a single index built over the union corpus — tested exactly as that
invariant (tests/test_federate.py), the property dfs_query_then_fetch
only approximates when shard stats drift.

The reference engine has a single Postgres store and no federation
(ref src/services/daos/extracted_search_results_dao.py:23-63); this is
how the engine spans Iceberg tables/regions at 10^12 docs — indexes
stay independently built/extended/compacted, queries see one corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..sources.catalog import Catalog
from .bm25 import lexicon_df, topk


def federated_stats(
    index_roots: list[str], terms: list[str]
) -> tuple[int, float, dict[str, float]]:
    """(global N, global avgdl, term -> global idf) across the indexes.

    Driver-side and metadata-scale by construction: registries are
    single JSON rows; the df lookups are term-isin row-group-pruned
    reads of vocab-scale lexicons (the serving path's economics, once
    per index)."""
    n_docs = 0
    sum_dl = 0.0
    df_g: dict[str, int] = {}
    for root in index_roots:
        cat = Catalog(root)
        reg = cat.read_registry()
        n_docs += int(reg["n_docs"])
        sum_dl += float(reg["sum_dl"])
        for t, d in lexicon_df(cat, reg, terms).items():
            df_g[t] = df_g.get(t, 0) + d
    if n_docs == 0:
        return 0, 0.0, {}
    avgdl = sum_dl / n_docs
    return n_docs, avgdl, {t: spec.idf(n_docs, d) for t, d in df_g.items()}


def federated_topk(
    spark: SparkSession,
    index_roots: list[str],
    queries: dict[str, str],
    mode: str = spec.MODE_DISJUNCTIVE,
    k: int = spec.TOP_K_DEFAULT,
    with_url: bool = False,
) -> DataFrame:
    """(query_id, rank, index_id, doc_id, score[, url]) — global top-k
    over all indexes with exact combined statistics.  index_id is the
    position in `index_roots`; (index_id, doc_id) is the federated
    document identity.  Ties: score DESC, index_id ASC, doc_id ASC.

    Correct because per-index top-k with GLOBAL stats is a superset
    filter of the global top-k: every document's score is final at its
    own index (no cross-index terms), so the union of per-index top-k
    contains the global top-k."""
    if not index_roots:
        raise ValueError("need at least one index root")
    all_terms = sorted(
        {t for text in queries.values() for t in spec.tokenize(text)}
    )
    _n, avgdl, idf_g = federated_stats(index_roots, all_terms)
    parts = []
    for i, root in enumerate(index_roots):
        part = topk(
            spark,
            root,
            queries,
            mode=mode,
            k=k,
            with_url=with_url,
            idf_override=idf_g,
            avgdl_override=avgdl,
        ).drop("rank")
        parts.append(part.withColumn("index_id", F.lit(i)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("index_id"), F.asc("doc_id")
    )
    cols = ["query_id", "rank", "index_id", "doc_id", "score"] + (
        ["url"] if with_url else []
    )
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*cols)
    )
