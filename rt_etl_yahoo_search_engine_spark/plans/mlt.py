"""More-Like-This: retrieve documents similar to a seed document.

Lucene parity (org.apache.lucene.queries.mlt.MoreLikeThis): build an
"interesting terms" query from the seed document's term vector — its
terms ranked by tf·idf — then run the terms as an ordinary disjunctive
BM25 search with the seed itself removed from the hits.  The reference
engine has no recommendation path at all; this is the standard way a
fulltext index answers "related results" next to a hit list.

Plan shape at 100 TB:
  * term-vector lookup — a driver-side pyarrow read of the staged tokens
    table(s) filtered to the handful of seed doc ids.  url_ordered builds
    write tokens doc-contiguously, so parquet min/max stats prune the
    read to the seeds' row groups — the same economics as the lexicon
    term-isin lookup (plans/bm25.lexicon_idf).  No Spark job, no scan.
  * idf lookup — the existing term-isin pruned lexicon read.
  * retrieval — plans/bm25.topk over the selected terms: the scan-side
    vectorized TAAT path; posting payload bytes never enter an exchange.
    Removing the seed doc is a k+1 over-fetch plus a rank re-number on
    the metadata-scale hit relation (k+1 rows per query), never a
    corpus-scale filter.

Tombstoned (deleted) docs never appear in the RESULTS (plans/bm25.topk
masks them), but a tombstoned seed still has its term vector until
compaction purges it — querying "more like a just-deleted doc" keeps
working, matching Lucene, where term vectors survive until merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..sources.catalog import Catalog
from . import bm25


def interesting_terms(
    index_root: str,
    seeds: dict[str, int],
    max_terms: int = 10,
    min_tf: int = 1,
    min_df: int = 1,
) -> dict[str, list[str]]:
    """query_id -> the seed doc's top `max_terms` terms by tf·idf
    (idf from the lexicon — the exact value BM25 scores with), ties
    broken by term ascending; deterministic and oracle-reproducible.

    min_tf / min_df are Lucene MoreLikeThis's noise gates (its defaults
    are 2 and 5); ours default to 1 so the selection is the pure tf·idf
    ranking unless the caller opts in.
    """
    import pyarrow.dataset as ds

    cat = Catalog(index_root)
    reg = cat.read_registry()
    ids = sorted({int(d) for d in seeds.values()})
    if not ids or max_terms <= 0:
        return {qid: [] for qid in seeds}
    vecs: dict[int, list[tuple[str, int]]] = {d: [] for d in ids}
    for dname in reg.get("token_dirs", ["tokens"]):
        tbl = ds.dataset(cat.path(dname)).to_table(
            columns=["doc_id", "term", "tf"],
            filter=ds.field("doc_id").isin(ids) & ds.field("term").is_valid(),
        )
        for d, t, tf in zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("term").to_pylist(),
            tbl.column("tf").to_pylist(),
        ):
            if tf >= min_tf:
                vecs[d].append((t, tf))
    all_terms = sorted({t for v in vecs.values() for t, _ in v})
    if not all_terms:  # every seed absent: isin([]) would infer null type
        return {qid: [] for qid in seeds}
    idf = bm25.lexicon_idf(cat, reg, all_terms)
    if min_df > 1:
        # df back from the BM25 idf is monotone; read df directly instead
        lex = ds.dataset(cat.path(reg["lexicon_dir"])).to_table(
            columns=["term", "df"], filter=ds.field("term").isin(all_terms)
        )
        dfs = dict(zip(lex.column("term").to_pylist(),
                       lex.column("df").to_pylist()))
    out: dict[str, list[str]] = {}
    for qid, d in seeds.items():
        cand = [
            (t, tf)
            for t, tf in vecs[int(d)]
            if t in idf and (min_df <= 1 or dfs.get(t, 0) >= min_df)
        ]
        # tf·idf descending, term ascending — the float product uses the
        # lexicon's stored idf double, so a SQL oracle computing
        # tf * ln((N - df + .5)/(df + .5) + 1) ranks identically
        cand.sort(key=lambda p: (-(p[1] * idf[p[0]]), p[0]))
        out[qid] = [t for t, _ in cand[:max_terms]]
    return out


def mlt_topk(
    spark: SparkSession,
    index_root: str,
    seeds: dict[str, int],
    k: int = spec.TOP_K_DEFAULT,
    max_terms: int = 10,
    min_tf: int = 1,
    min_df: int = 1,
    with_url: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id [, url], score): disjunctive BM25 top-k of
    each seed's interesting-terms query, the seed itself excluded.

    seeds: query_id -> INDEX doc_id.  A seed with no selectable terms (or
    one absent from the index) contributes no rows.
    """
    terms = interesting_terms(
        index_root, seeds, max_terms=max_terms, min_tf=min_tf, min_df=min_df
    )
    queries = {qid: " ".join(ts) for qid, ts in terms.items() if ts}
    hits = bm25.topk(
        spark,
        index_root,
        queries or {"_": ""},
        mode=spec.MODE_DISJUNCTIVE,
        k=k + 1,
        with_url=with_url,
    )
    seeds_df = spark.createDataFrame(
        [(qid, int(d)) for qid, d in seeds.items()],
        schema="query_id string, seed long",
    )
    cols = ["query_id", "rank", "doc_id"] + (["url"] if with_url else [])
    # ranks are unique per query, so a row_number over the old rank both
    # preserves the order and closes the gap the seed leaves; k+1 fetched
    # rows guarantee k survivors whenever they exist
    w = Window.partitionBy("query_id").orderBy("rank")
    return (
        hits.join(F.broadcast(seeds_df), "query_id")
        .filter(F.col("doc_id") != F.col("seed"))
        .withColumn("new_rank", F.row_number().over(w))
        .filter(F.col("new_rank") <= k)
        .select(*[c if c != "rank" else F.col("new_rank").alias("rank")
                  for c in cols], "score")
    )
