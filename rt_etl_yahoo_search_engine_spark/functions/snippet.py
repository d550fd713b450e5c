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


def add_highlights(
    spark: SparkSession,
    out: DataFrame,
    queries: dict[str, str],
    body_col: str = "body",
    width: int = 120,
    before: int = 40,
    n_fragments: int = 3,
    highlight_col: str = "highlight",
) -> DataFrame:
    """Elasticsearch-highlighter analog: up to ``n_fragments`` fragments
    per hit, each a ``width``-char window of the body with every
    case-insensitive occurrence of a query token wrapped in
    ``<em>...</em>`` (ref read path returns whole bodies,
    src/services/daos/extracted_search_results_dao.py:23-63; a search UI
    wants marked fragments — ES `highlight` with `fragment_size` /
    `number_of_fragments`).

    Deterministic, purely positional contract (so it is exactly
    SQL-expressible and oracle-checkable — ES's fragment *scoring* is
    not reproduced):

    1. tag pass: every occurrence of any query token (longest token
       first at equal start, global, case-insensitive, raw-substring
       semantics like add_snippets) is wrapped in-place -> the TAGGED
       string.  Tag characters count toward fragment windows.
    2. fragment i starts at ``max(prev_end, p_i - before)`` (fragment 0:
       ``max(1, p_0 - before)``) where ``p_i`` is the first ``<em>`` at
       or after the previous fragment's end; each fragment is the
       ``width``-char cut of the tagged string from that start.
    3. hits whose body contains no query token emit NO fragment rows
       (ES: field absent from the highlight response).

    Output: one row per (hit, fragment) — input columns plus
    (``frag_idx`` int, ``highlight_col`` string) via posexplode.

    Scale shape: per-query pattern is a broadcast join; the tag pass is
    one JVM `regexp_replace`, fragment starts are an unrolled
    whole-stage-codegen locate/substring chain — all on rows that are
    already k-per-query, never corpus-scale.
    """
    pat_rows = []
    for qid, text in queries.items():
        # longest-first alternation: Java regex and RE2 both match
        # alternatives leftmost-FIRST, so ordering by (-len, tok) makes
        # "working" beat "work" at the same start in engine and oracle
        toks = sorted(set(spec.tokenize(text)), key=lambda t: (-len(t), t))
        if toks:  # tokens are [a-z0-9]+: no regex metacharacters
            pat_rows.append((qid, "(?i)(" + "|".join(toks) + ")"))
    qt = spark.createDataFrame(pat_rows, "query_id string, _hl_pat string")
    d = out.join(F.broadcast(qt), "query_id", "inner").withColumn(
        "_hl_tg",
        F.expr(f"regexp_replace({body_col}, _hl_pat, '<em>$1</em>')"),
    )
    width, before = int(width), int(before)
    frag_exprs, tmp_cols, prev_end = [], [], None
    for i in range(int(n_fragments)):
        p, s, e = f"_hl_pp{i}", f"_hl_ss{i}", f"_hl_ee{i}"
        if i == 0:
            d = d.withColumn(p, F.expr("locate('<em>', _hl_tg)")).withColumn(
                s,
                F.expr(f"CASE WHEN {p} > 0 THEN greatest(1, {p} - {before}) END"),
            )
        else:
            d = d.withColumn(
                p,
                F.expr(
                    f"CASE WHEN {prev_end} IS NOT NULL"
                    f" THEN locate('<em>', _hl_tg, {prev_end}) ELSE 0 END"
                ),
            ).withColumn(
                s,
                F.expr(
                    f"CASE WHEN {p} > 0"
                    f" THEN greatest({prev_end}, {p} - {before}) END"
                ),
            )
        d = d.withColumn(e, F.expr(f"{s} + {width}"))
        prev_end = e
        tmp_cols += [p, s, e]
        frag_exprs.append(
            f"CASE WHEN {s} IS NOT NULL THEN substring(_hl_tg, {s}, {width}) END"
        )
    d = d.withColumn(
        "_hl_frags",
        F.expr("filter(array(" + ", ".join(frag_exprs) + "), x -> x IS NOT NULL)"),
    )
    d = d.select("*", F.posexplode("_hl_frags").alias("frag_idx", highlight_col))
    return d.drop("_hl_pat", "_hl_tg", "_hl_frags", *tmp_cols)
