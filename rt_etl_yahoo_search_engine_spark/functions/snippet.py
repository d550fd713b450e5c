"""Query-aware snippet extraction for materialized result rows.

The reference's read path returns whole body rows to the client (ref
src/services/daos/extracted_search_results_dao.py:23-63); a search UI
wants the fragment AROUND the match.  `add_snippets` appends that
fragment to any (query_id, <body>) result frame — e.g. the output of
plans/bm25.topk(fields=...):

    snippet = the `width`-char window of the body starting `before`
    chars before the FIRST occurrence of any of the query's tokens
    (case-insensitive, earliest occurrence across tokens wins), or the
    body head when no token occurs as a raw substring.

Deterministic and purely positional — no scoring, no fragment ranking —
so it is exactly SQL-expressible and oracle-checkable.  Entirely JVM
(whole-stage codegen): the per-query token array is a broadcast join,
the first-occurrence search is higher-order `transform`/`filter`/
`array_min` over that array, and the cut is one `substring`.  Cost is
O(len(body) * n_terms) per row on rows that are already k-per-query —
never a corpus-scale operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import spec


def add_snippets(
    spark: SparkSession,
    out: DataFrame,
    queries: dict[str, str],
    body_col: str = "body",
    width: int = 120,
    before: int = 40,
    snippet_col: str = "snippet",
) -> DataFrame:
    """Append `snippet_col` to `out` (module docstring).

    out: any frame with (query_id, `body_col`) — typically top-k hits
    joined to their field rows.  Rows whose query_id is not in `queries`
    keep a NULL snippet (no token list to search).
    """
    qt = spark.createDataFrame(
        [(qid, sorted(set(spec.tokenize(text)))) for qid, text in queries.items()],
        "query_id string, q_terms array<string>",
    )
    # 1-based first hit of any token in lower(body); NULL when none hits.
    # locate() returns 0 on miss, so filter(p > 0) before the min.
    pos = (
        f"array_min(filter(transform(q_terms, t -> locate(t, lower({body_col})))"
        ", p -> p > 0))"
    )
    cut = (
        f"CASE WHEN q_terms IS NULL THEN NULL "  # query_id not in `queries`
        f"WHEN _snip_pos IS NULL THEN substring({body_col}, 1, {int(width)}) "
        f"ELSE substring({body_col}, greatest(1, _snip_pos - {int(before)}), "
        f"{int(width)}) END"
    )
    return (
        out.join(F.broadcast(qt), "query_id", "left")
        .withColumn("_snip_pos", F.expr(pos))
        .withColumn(snippet_col, F.expr(cut))
        .drop("q_terms", "_snip_pos")
    )
