"""Multi-field retrieval — Elasticsearch `multi_match` in its three
classic types over per-field inverted indexes:

  best_fields   field-centric: each field is scored as its own BM25
                query (own df/avgdl/doc_len); a doc's score is its BEST
                field's score plus `tie_breaker` times the rest
                (dis_max ACROSS FIELDS — ES's default type, right when
                the answer lives in one field, e.g. title OR body).
  most_fields   field-centric: per-field scores SUM (right when many
                fields matching reinforces relevance).
  cross_fields  term-centric: the fields act as one logical field — for
                each TERM, its per-field weights combine by dis_max, and
                the idf every field's weight gets is BLENDED from a
                cross-field document frequency df_blend(t) =
                max_f df_f(t) (Lucene BlendedTermQuery's df adjustment,
                which kills best_fields' idf trap: a term rare in the
                title but common in the body no longer gets an inflated
                title idf).  Per-doc score = sum over terms.

Every field is its own physical index over the SAME corpus in the same
url order (ES: every field is its own inverted index within one Lucene
segment set), so doc_ids agree across fields by construction and no
doc-identity join is needed.

The reference engine has no fields beyond one text blob (ref
`database/tables.py:69-79` stores url/date/body but search is Postgres
PK lookup only); multi_match is how a real search box queries
title+body with one input.

Scale shape: best/most_fields ride plans/stats.score_docs per field —
scan-side exact scoring, narrow (query, doc, score) rows out, union +
one groupBy combine keyed (query_id, doc_id) (partial-agg friendly; no
payload shuffle).  cross_fields rides stats.term_norms per field —
same unit scan, O(sum df) narrow rows — plus a vocab-bounded broadcast
of blended idfs; two groupBys (term-combine, then doc-sum) both keyed
on subsets of (query_id, term, doc_id), map-side combinable.  At 100 TB
nothing here touches postings payloads outside the scan units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..sources.catalog import Catalog
from .bm25 import lexicon_df
from .stats import score_docs, term_norms

TYPE_BEST = "best_fields"
TYPE_MOST = "most_fields"
TYPE_CROSS = "cross_fields"


def _topk_window(rel: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _dismax_combine(sm, mx, tie_breaker: float):
    return mx + F.lit(float(tie_breaker)) * (sm - mx)


def multi_match_topk(
    spark: SparkSession,
    field_roots: dict[str, str],
    queries: dict[str, str],
    match_type: str = TYPE_BEST,
    boosts: dict[str, float] | None = None,
    tie_breaker: float = 0.0,
    mode: str = spec.MODE_DISJUNCTIVE,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — top-k under the chosen
    multi_match type over `field_roots` (field name -> index root, all
    built over the same corpus in the same doc order).  `boosts` maps
    field -> multiplier (default 1.0).  Ties: score DESC, doc_id ASC.

    mode=conjunctive under best/most_fields applies PER FIELD (ES
    operator=AND on a field-centric multi_match: a field's clause
    matches only if the doc has all terms in THAT field); under
    cross_fields it applies across the blended field (a doc must have
    every term in at least one field) — both are ES's documented
    semantics."""
    if not field_roots:
        raise ValueError("need at least one field index")
    boosts = boosts or {}
    fields = sorted(field_roots)

    if match_type in (TYPE_BEST, TYPE_MOST):
        parts = []
        for f in fields:
            bf = float(boosts.get(f, 1.0))
            s = score_docs(spark, field_roots[f], queries, mode)
            parts.append(
                s.select(
                    "query_id", "doc_id",
                    (F.col("score") * F.lit(bf)).alias("w"),
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        g = u.groupBy("query_id", "doc_id").agg(
            F.sum("w").alias("sm"), F.max("w").alias("mx")
        )
        if match_type == TYPE_MOST:
            rel = g.select(
                "query_id", "doc_id", F.col("sm").alias("score")
            )
        else:
            rel = g.select(
                "query_id", "doc_id",
                _dismax_combine(F.col("sm"), F.col("mx"), tie_breaker)
                .alias("score"),
            )
        return _topk_window(rel, k)

    if match_type != TYPE_CROSS:
        raise ValueError(f"unknown multi_match type: {match_type}")

    # --- cross_fields ---
    all_terms = sorted(
        {t for text in queries.values() for t in spec.tokenize(text)}
    )
    # Blended stats phase (driver-side, vocab-bounded — the same
    # metadata-scale lookup plans/federate.federated_stats does).
    df_blend: dict[str, int] = {}
    n_docs = 0
    for f in fields:
        cat = Catalog(field_roots[f])
        reg = cat.read_registry()
        n_docs = max(n_docs, int(reg["n_docs"]))
        for t, d in lexicon_df(cat, reg, all_terms).items():
            df_blend[t] = max(df_blend.get(t, 0), d)
    if not df_blend:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    idf_rows = [
        (t, spec.idf(n_docs, d)) for t, d in sorted(df_blend.items())
    ]
    idf_df = spark.createDataFrame(idf_rows, "term string, idf_blend double")

    parts = []
    for f in fields:
        bf = float(boosts.get(f, 1.0))
        tn = term_norms(spark, field_roots[f], queries)
        parts.append(
            tn.select(
                "query_id", "term", "doc_id",
                (F.col("tfnorm") * F.lit(bf)).alias("tfn"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    weighted = u.join(F.broadcast(idf_df), "term").select(
        "query_id", "term", "doc_id",
        (F.col("idf_blend") * F.col("tfn")).alias("w"),
    )
    per_term = weighted.groupBy("query_id", "term", "doc_id").agg(
        F.sum("w").alias("sm"), F.max("w").alias("mx")
    ).select(
        "query_id", "term", "doc_id",
        _dismax_combine(F.col("sm"), F.col("mx"), tie_breaker).alias("tw"),
        F.lit(1).alias("one"),
    )
    per_doc = per_term.groupBy("query_id", "doc_id").agg(
        F.sum("tw").alias("score"), F.sum("one").alias("n_matched")
    )
    if mode == spec.MODE_CONJUNCTIVE:
        qn = spark.createDataFrame(
            [
                (qid, len(set(spec.tokenize(text))))
                for qid, text in sorted(queries.items())
            ],
            "query_id string, n_terms int",
        )
        per_doc = per_doc.join(F.broadcast(qn), "query_id").filter(
            F.col("n_matched") == F.col("n_terms")
        )
    return _topk_window(per_doc.select("query_id", "doc_id", "score"), k)


def combined_fields_topk(
    spark: SparkSession,
    field_roots: dict[str, str],
    queries: dict[str, str],
    weights: dict[str, float] | None = None,
    mode: str = spec.MODE_DISJUNCTIVE,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — ES `multi_match`
    type=combined_fields (the BM25F-shaped third type): the fields act
    as ONE pseudo-field whose term frequency and length are weighted
    sums across fields,

        tf_c(d,t)  = sum_f w_f * tf_f(d,t)
        dl_c(d)    = sum_f w_f * dl_f(d)
        avgdl_c    = sum_f w_f * avgdl_f
        df_c(t)    = max_f df_f(t)          (the blended df)

    and each term scores as standard BM25 of the combined quantities:
    idf(df_c) * tf_c*(k1+1) / (tf_c + k1*(1-b+b*dl_c/avgdl_c)), summed
    per doc.  Unlike best/most_fields this rewards a term's occurrences
    ACROSS fields as if they were one field (ES's documented motivation
    for the type); unlike cross_fields the combination happens on the
    raw frequencies, not on per-field normalized weights.

    Determinism contract: tf_c and dl_c are combined in SORTED FIELD
    ORDER with a per-field pivot (one column per field, added left to
    right), so exact ties — common when fields overlap — break
    identically in any engine evaluating the same expression.

    Scale shape: per-field stats.term_raw unit scans (O(sum df) narrow
    integer rows), a (query, term, doc) pivot groupBy, one doc-keyed
    join per field to that field's (doc_id, doc_len) projection of the
    doc-major tokens store (column-pruned scan, hash join), a vocab-bounded broadcast of blended idfs,
    and a final (query, doc) sum + WindowGroupLimit top-k."""
    from ..plans.stats import term_raw

    if not field_roots:
        raise ValueError("need at least one field index")
    weights = weights or {}
    fields = sorted(field_roots)
    wmap = {f: float(weights.get(f, 1.0)) for f in fields}

    all_terms = sorted(
        {t for text in queries.values() for t in spec.tokenize(text)}
    )
    df_blend: dict[str, int] = {}
    n_docs = 0
    avgdl_c = 0.0
    for f in fields:
        cat = Catalog(field_roots[f])
        reg = cat.read_registry()
        n_docs = max(n_docs, int(reg["n_docs"]))
        avgdl_c = avgdl_c + wmap[f] * (
            float(reg["sum_dl"]) / int(reg["n_docs"])
        )
        for t, d in lexicon_df(cat, reg, all_terms).items():
            df_blend[t] = max(df_blend.get(t, 0), d)
    if not df_blend:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    idf_df = spark.createDataFrame(
        [(t, spec.idf(n_docs, d)) for t, d in sorted(df_blend.items())],
        "term string, idf_c double",
    )

    parts = []
    for f in fields:
        tr = term_raw(spark, field_roots[f], queries)
        parts.append(
            tr.select(
                "query_id", "term", "doc_id",
                F.lit(f).alias("field"), F.col("tf").cast("double"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    pivots = [
        F.sum(
            F.when(F.col("field") == f, F.lit(wmap[f]) * F.col("tf"))
        ).alias(f"_tf_{i}")
        for i, f in enumerate(fields)
    ]
    tfc_expr = F.coalesce(F.col("_tf_0"), F.lit(0.0))
    for i in range(1, len(fields)):
        tfc_expr = tfc_expr + F.coalesce(F.col(f"_tf_{i}"), F.lit(0.0))
    tfc = (
        u.groupBy("query_id", "term", "doc_id")
        .agg(*pivots)
        .select("query_id", "term", "doc_id", tfc_expr.alias("tf_c"))
    )
    dl = None
    for i, f in enumerate(fields):
        cat = Catalog(field_roots[f])
        reg = cat.read_registry()
        dm = (
            cat.read(spark, *reg.get("token_dirs", ["tokens"]))
            .select("doc_id", "doc_len")
            .distinct()
            .select("doc_id",
                    (F.lit(wmap[f]) * F.col("doc_len")).alias(f"_dl_{i}"))
        )
        # full outer + coalesce-0: a doc absent from one field's tokens
        # store (genuinely empty field value) still scores on the others
        # (r3, ADVICE r2: an inner join silently dropped such docs)
        dl = dm if dl is None else dl.join(dm, "doc_id", "full_outer")
    dlc_expr = F.coalesce(F.col("_dl_0"), F.lit(0.0))
    for i in range(1, len(fields)):
        dlc_expr = dlc_expr + F.coalesce(F.col(f"_dl_{i}"), F.lit(0.0))
    dlc = dl.select("doc_id", dlc_expr.alias("dl_c"))

    scored_terms = (
        tfc.join(dlc, "doc_id")
        .join(F.broadcast(idf_df), "term")
        .select(
            "query_id", "doc_id",
            (
                F.col("idf_c")
                * (F.col("tf_c") * F.lit(spec.K1 + 1.0))
                / (
                    F.col("tf_c")
                    + F.lit(spec.K1)
                    * (
                        F.lit(1.0 - spec.B)
                        + F.lit(spec.B) * F.col("dl_c") / F.lit(avgdl_c)
                    )
                )
            ).alias("w"),
            F.lit(1).alias("one"),
        )
    )
    per_doc = scored_terms.groupBy("query_id", "doc_id").agg(
        F.sum("w").alias("score"), F.sum("one").alias("n_matched")
    )
    if mode == spec.MODE_CONJUNCTIVE:
        qn = spark.createDataFrame(
            [
                (qid, len(set(spec.tokenize(text))))
                for qid, text in sorted(queries.items())
            ],
            "query_id string, n_terms int",
        )
        per_doc = per_doc.join(F.broadcast(qn), "query_id").filter(
            F.col("n_matched") == F.col("n_terms")
        )
    return _topk_window(per_doc.select("query_id", "doc_id", "score"), k)
