"""Multi-fragment highlighting — functions/snippet.add_highlights.

The contract is purely positional (function docstring): tag pass wraps
every case-insensitive raw-substring occurrence of a query token in
<em></em> (longest token wins at equal start), then up to n_fragments
width-char windows of the TAGGED string, each anchored `before` chars
ahead of the next <em> at-or-after the previous fragment's end; no-match
hits emit no rows.  Checked against a character-exact pure-Python
reimplementation plus an end-to-end pass over the fields path of the
shared index.
"""

import re

from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.snippet import add_highlights


def _py_highlights(body, text, width=120, before=40, n_fragments=3):
    toks = sorted(set(spec.tokenize(text)), key=lambda t: (-len(t), t))
    if not toks:
        return []
    tagged = re.sub(
        "(" + "|".join(toks) + ")", r"<em>\1</em>", body, flags=re.IGNORECASE
    )
    frags, prev_end = [], None  # prev_end: 1-based position after fragment
    for i in range(n_fragments):
        if i == 0:
            p = tagged.find("<em>") + 1  # 1-based; 0 = miss
            if p == 0:
                break
            s = max(1, p - before)
        else:
            idx = tagged.find("<em>", prev_end - 1)
            if idx < 0:
                break
            s = max(prev_end, idx + 1 - before)
        frags.append(tagged[s - 1 : s - 1 + width])
        prev_end = s + width
    return frags


BODIES = [
    # single early match
    ("q1", "needle at the very start " + "z1 " * 100),
    # match mid-body, several occurrences far apart (3+ fragments)
    ("q1", ("x2 " * 60 + "a needle here ") * 4 + "y3 " * 60),
    # two occurrences INSIDE one fragment window (second must not re-anchor)
    ("q1", "w4 " * 20 + "needle needle twice close " + "v5 " * 100),
    # no match at all -> zero rows
    ("q1", "no match anywhere in this body at all " + "u6 " * 60),
    # case-insensitive + tags count toward window
    ("q1", "t7 " * 30 + "NEEDLE in caps " + "s8 " * 100),
    # overlapping-prefix tokens: longest must win at equal start
    ("q2", "work working worked workshop " + "r9 " * 80),
    # multi-term query, interleaved terms
    ("q2", "q0 " * 25 + "alpha then working then ALPHA again " + "p1 " * 80),
    # match at the very end (fragment truncated by body end)
    ("q1", "o2 " * 120 + "needle"),
    ("q1", "short"),
]
QUERIES = {"q1": "needle", "q2": "working work alpha"}


def _spark_frags(spark, rows, queries, **kw):
    df = spark.createDataFrame(
        [(q, b, i) for i, (q, b) in enumerate(rows)],
        "query_id string, body string, row_id long",
    )
    out = add_highlights(spark, df, queries, **kw)
    got = {}
    for r in out.collect():
        got.setdefault(r.row_id, []).append((r.frag_idx, r.highlight))
    return {k: [f for _, f in sorted(v)] for k, v in got.items()}


def test_matches_python_reimplementation(spark):
    got = _spark_frags(spark, BODIES, QUERIES)
    for i, (qid, body) in enumerate(BODIES):
        assert got.get(i, []) == _py_highlights(body, QUERIES[qid]), (i, qid)


def test_nonstandard_geometry(spark):
    kw = dict(width=45, before=10, n_fragments=5)
    got = _spark_frags(spark, BODIES, QUERIES, **kw)
    for i, (qid, body) in enumerate(BODIES):
        assert got.get(i, []) == _py_highlights(body, QUERIES[qid], 45, 10, 5), i


def test_no_match_emits_no_rows(spark):
    got = _spark_frags(spark, [("q1", "entirely unrelated words only")], QUERIES)
    assert got == {}


def test_every_fragment_contains_a_tag(spark):
    got = _spark_frags(spark, BODIES, QUERIES)
    # the anchor <em> starts at most `before` chars after the fragment
    # start, so every emitted fragment shows at least the tag opening
    for frags in got.values():
        for f in frags:
            assert "<em" in f


def test_end_to_end_fields_path(spark, index_dir, corpus_dir):
    """topk(fields=extracted text) + add_highlights: every hit emits >=1
    fragment (hits come from the index, bodies are the text it tokenized)
    whose tagged span is a query token, char-exact vs the Python oracle."""
    from rt_etl_yahoo_search_engine_spark.functions.extract import page_text_df
    from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
    from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

    lex = Catalog(index_dir).read(spark, "lexicon").orderBy(F.desc("df"))
    t = lex.select("term").limit(2).collect()
    queries = {"q": f"{t[0]['term']} {t[1]['term']}"}
    fields = page_text_df(spark.read.parquet(corpus_dir)).withColumnRenamed(
        "text", "body"
    )
    hits = topk(spark, index_dir, queries, k=5, fields=fields)
    out = add_highlights(spark, hits, queries).collect()
    assert out
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append((r.frag_idx, r.highlight))
    bodies = {r["url"]: r["body"] for r in fields.collect()}
    assert len(by_url) == 5  # every hit of q emits at least one fragment
    toks = set(spec.tokenize(queries["q"]))
    for url, frags in by_url.items():
        got = [f for _, f in sorted(frags)]
        assert got == _py_highlights(bodies[url], queries["q"]), url
        for f in got:
            inner = re.findall(r"<em>([a-z0-9]+)</em>", f)
            assert all(tok in toks for tok in inner)
