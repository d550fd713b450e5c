"""ES intervals query (plans/intervals.py) — match leaves (ordered /
unordered, max_gaps) and any_of / all_of combinators, vs a pure-Python
minimal-interval oracle; scores equal the disjunctive BM25 path."""

import math

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.positions import (
    build_positions,
)
from rt_etl_yahoo_search_engine_spark.plans.intervals import (
    AllOf,
    AnyOf,
    Match,
    intervals_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma delta epsilon zeta"),
    ("d1", "alpha x x x beta"),
    ("d2", "beta x alpha"),
    ("d3", "alpha x x x x x x x beta x gamma"),
    ("d4", "gamma gamma gamma"),
    ("d5", "x alpha x beta alpha beta", ),
    ("d6", "beta alpha beta", ),
    ("d7", "delta x epsilon x x delta", ),
]


@pytest.fixture(scope="module")
def iv_index(spark, tmp_path_factory):
    from rt_etl_yahoo_search_engine_spark.operators.index_build import (
        build_index,
    )

    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS],
        "url string, text string, lang string",
    )
    root = str(tmp_path_factory.mktemp("iv") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, df, root, tokenizer="text")
    toks = {u: spec.tokenize(t) for u, t in DOCS}
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap, toks


def _match_leaf(seq, m: Match):
    terms = spec.tokenize(m.text)
    if not terms:
        return False
    if m.ordered:
        n = len(terms)
        bound = n - 1 + m.max_gaps if m.max_gaps >= 0 else None

        def ok_from(start_i):
            cur = start_i
            for t in terms[1:]:
                nxt = [
                    i for i, x in enumerate(seq)
                    if x == t and i > cur
                    and (bound is None or i <= start_i + bound)
                ]
                if not nxt:
                    return False
                cur = min(nxt)
            return True

        return any(
            seq[i] == terms[0] and ok_from(i) for i in range(len(seq))
        )
    need = set(terms)
    if m.max_gaps < 0:
        return need <= set(seq)
    w = len(need) + m.max_gaps
    return any(
        need <= set(seq[a : a + w]) for a in range(len(seq))
    )


def _min_set(ivs):
    """Lucene minimality: drop intervals containing another interval."""
    return {
        (s, e)
        for (s, e) in ivs
        if not any(
            (s2, e2) != (s, e) and s2 >= s and e2 <= e for (s2, e2) in ivs
        )
    }


def _ivset(seq, node):
    """Ground truth MINIMAL match-interval set {(s, e)} of a node,
    Lucene-parity semantics: children contribute minimal intervals;
    constrained all_of enumerates all combinations of them and filters
    by BETWEEN-rules gaps (ordered: sum of start-minus-prev-end-minus-1;
    unordered: envelope width minus sum of child spans); minimality is
    re-applied at every node."""
    import itertools

    if isinstance(node, Match):
        terms = spec.tokenize(node.text)
        pos = {
            t: [i for i, x in enumerate(seq) if x == t] for t in set(terms)
        }
        if len(terms) == 1:
            return {(i, i) for i in pos[terms[0]]}
        if node.ordered:
            bound = (
                len(terms) - 1 + node.max_gaps
                if node.max_gaps >= 0 else 10**9
            )
            out = set()

            def chains(i, prev, start):
                if i == len(terms):
                    out.add((start, prev))
                    return
                for p in pos[terms[i]]:
                    if p > prev and p <= start + bound:
                        chains(i + 1, p, start)

            for p0 in pos[terms[0]]:
                chains(1, p0, p0)
            return _min_set(out)
        nd = len(set(terms))
        w = nd + node.max_gaps if node.max_gaps >= 0 else 10**9
        out = set()
        for combo in itertools.product(
            *[pos[t] for t in sorted(set(terms))]
        ):
            if max(combo) - min(combo) + 1 <= w:
                out.add((min(combo), max(combo)))
        return _min_set(out)
    if isinstance(node, AnyOf):
        return _min_set(
            set().union(*(_ivset(seq, s) for s in node.sources))
        )
    kids = [_ivset(seq, s) for s in node.sources]
    # states: (s, e, g) ordered / (s, e, sw) unordered
    if node.ordered:
        cur = {(s, e, 0) for (s, e) in kids[0]}
        for kv in kids[1:]:
            cur = {
                (s, e2, g + s2 - e - 1)
                for (s, e, g) in cur
                for (s2, e2) in kv
                if s2 > e
            }
        if node.max_gaps >= 0:
            cur = {(s, e, g) for (s, e, g) in cur if g <= node.max_gaps}
    else:
        cur = {(s, e, e - s + 1) for (s, e) in kids[0]}
        for kv in kids[1:]:
            cur = {
                (min(s, s2), max(e, e2), sw + e2 - s2 + 1)
                for (s, e, sw) in cur
                for (s2, e2) in kv
            }
        if node.max_gaps >= 0:
            cur = {
                (s, e, sw)
                for (s, e, sw) in cur
                if e - s + 1 - sw <= node.max_gaps
            }
    return _min_set({(s, e) for (s, e, _) in cur})


def _match(seq, node):
    if isinstance(node, Match):
        return _match_leaf(seq, node)
    if isinstance(node, AnyOf):
        return any(_match(seq, s) for s in node.sources)
    if node.ordered or node.max_gaps >= 0:
        return bool(_ivset(seq, node))
    return all(_match(seq, s) for s in node.sources)


QUERIES = {
    "ord0": Match("alpha beta", ordered=True, max_gaps=0),
    "ord3": Match("alpha beta", ordered=True, max_gaps=3),
    "ord_unb": Match("alpha beta gamma", ordered=True),
    "unord1": Match("beta alpha", max_gaps=1),
    "contain": Match("delta epsilon"),
    "dup_ord": Match("alpha beta alpha", ordered=True),
    "anyof": AnyOf((Match("alpha beta", ordered=True, max_gaps=0),
                    Match("delta epsilon", max_gaps=1))),
    "allof_plain": AllOf((Match("alpha beta", ordered=True, max_gaps=0),
                          Match("gamma"))),
    "allof_terms": AllOf((Match("delta"), Match("epsilon")),
                         ordered=True, max_gaps=1),
    "nested": AnyOf((AllOf((Match("zeta"), Match("epsilon"))),
                     Match("gamma gamma", ordered=True, max_gaps=0))),
    # r3: constrained-ordered all_of over NON-single-term children
    # (minimal-interval DP path)
    "cx_any": AllOf((AnyOf((Match("alpha"), Match("gamma"))),
                     Match("beta")), ordered=True, max_gaps=1),
    "cx_multi": AllOf((Match("alpha beta", ordered=True, max_gaps=3),
                       Match("gamma")), ordered=True, max_gaps=2),
    "cx_unb": AllOf((Match("beta"),
                     Match("alpha beta", ordered=True)), ordered=True),
    "cx_unord_child": AllOf((Match("delta epsilon", max_gaps=1),
                             Match("delta")), ordered=True, max_gaps=3),
    "cx_nested": AllOf(
        (AllOf((AnyOf((Match("alpha"), Match("x"))), Match("beta")),
               ordered=True, max_gaps=0),
         Match("gamma")),
        ordered=True, max_gaps=4),
    # r3: UNORDERED constrained all_of over complex children (envelope DP)
    "cu_pair": AllOf((Match("alpha beta", ordered=True, max_gaps=3),
                      Match("gamma")), ordered=False, max_gaps=2),
    "cu_any": AllOf((AnyOf((Match("zeta"), Match("delta"))),
                     Match("epsilon")), ordered=False, max_gaps=1),
    "cu_plain_child": AllOf(
        (AllOf((Match("alpha"), Match("beta x"))), Match("gamma")),
        ordered=True),
}


def test_match_sets_equal_oracle(spark, iv_index):
    root, docmap, toks = iv_index
    out = intervals_topk(spark, root, QUERIES, k=20)
    got = {qid: set() for qid in QUERIES}
    for r in out.collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, src in QUERIES.items():
        want = {
            docmap[u] for u, seq in toks.items() if _match(seq, src)
        }
        assert got[qid] == want, qid


def test_scores_are_disjunctive_bm25(spark, iv_index):
    root, docmap, toks = iv_index
    out = intervals_topk(
        spark, root, {"q": Match("alpha beta", ordered=True, max_gaps=3)},
        k=20,
    )
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    n = len(DOCS)
    df = {}
    for seq in toks.values():
        for t in set(seq):
            df[t] = df.get(t, 0) + 1
    avgdl = sum(len(s) for s in toks.values()) / n
    want = {}
    for u, seq in toks.items():
        s = 0.0
        for t in ("alpha", "beta"):
            tf = seq.count(t)
            if not tf:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (spec.K1 + 1.0)) / (
                tf + spec.K1 * (1.0 - spec.B + spec.B * len(seq) / avgdl)
            )
        if _match_leaf(seq, Match("alpha beta", ordered=True, max_gaps=3)):
            want[docmap[u]] = s
    ranked = sorted(want.items(), key=lambda p: (-p[1], p[0]))
    assert [(r["rank"], r["doc_id"]) for r in rows] == [
        (i + 1, d) for i, (d, _) in enumerate(ranked)
    ]
    for r, (_, s) in zip(rows, ranked):
        assert r["score"] == pytest.approx(s, rel=1e-12)


def test_no_algebra_gates_remain(spark, iv_index):
    """r3: both former NotImplementedError gates (unordered constrained
    all_of over complex children; plain all_of nested inside a
    constrained node) now run through the envelope DP — covered against
    the brute-force oracle via cu_* in QUERIES; this pins that they
    EXECUTE rather than raise."""
    root, docmap, toks = iv_index
    qs = {
        "g1": AllOf((Match("alpha beta"), Match("gamma")),
                    ordered=False, max_gaps=2),
        "g2": AllOf(
            (AllOf((Match("alpha"), Match("beta x"))), Match("gamma")),
            ordered=True,
        ),
    }
    out = intervals_topk(spark, root, qs, k=20)
    got = {qid: set() for qid in qs}
    for r in out.collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, src in qs.items():
        want = {docmap[u] for u, seq in toks.items() if _match(seq, src)}
        assert got[qid] == want, qid


def test_randomized_trees_vs_bruteforce(spark, iv_index):
    """Deterministic randomized sweep: random source trees (leaves,
    any_of, ordered/unordered constrained all_of, nesting) over the
    fixture corpus, match sets vs the brute-force interval-set oracle."""
    import random

    root, docmap, toks = iv_index
    rng = random.Random(20260821)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "x"]

    def rand_leaf():
        n = rng.choice([1, 1, 2, 2, 3])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        if n == 1:
            return Match(text)
        return Match(text, ordered=rng.random() < 0.5,
                     max_gaps=rng.choice([-1, 0, 1, 2, 3]))

    def rand_tree(depth):
        if depth == 0 or rng.random() < 0.35:
            return rand_leaf()
        kids = tuple(rand_tree(depth - 1) for _ in range(rng.choice([2, 2, 3])))
        if rng.random() < 0.4:
            return AnyOf(kids)
        ordered = rng.random() < 0.5
        mg = rng.choice([-1, 0, 2, 4])
        # plain unordered-unbounded children are fine anywhere; the
        # engine handles every combination since r3
        return AllOf(kids, ordered=ordered, max_gaps=mg)

    qs = {}
    while len(qs) < 18:
        t = rand_tree(2)
        # skip degenerate trees whose every leaf is empty-tokenized
        qs[f"r{len(qs)}"] = t
    out = intervals_topk(spark, root, qs, k=30)
    got = {qid: set() for qid in qs}
    for r in out.collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, src in qs.items():
        want = {docmap[u] for u, seq in toks.items() if _match(seq, src)}
        assert got[qid] == want, (qid, src)


def test_parent_gaps_exclude_child_internal_gaps(spark, iv_index):
    """Lucene/ES parity (r3 review): a parent's max_gaps counts only
    positions BETWEEN the matching rules.  d0 = 'alpha beta gamma
    delta ...': child [alpha..gamma] has 1 internal gap (its own
    max_gaps=1 allows it), delta follows IMMEDIATELY, so the parent
    chain has 0 between-rules gaps and must match at max_gaps=0 —
    the pre-review accounting (width - covered) wrongly rejected it."""
    root, docmap, toks = iv_index
    q = AllOf(
        (Match("alpha gamma", ordered=True, max_gaps=1), Match("delta")),
        ordered=True, max_gaps=0,
    )
    out = intervals_topk(spark, root, {"q": q}, k=10)
    got = {r["doc_id"] for r in out.collect()}
    assert docmap["d0"] in got


def test_empty_analyzed_child_matches_nothing(spark, iv_index):
    """An empty-tokenized rule inside a constrained all_of kills the
    node (r3 review: used to raise IndexError)."""
    root, _, _ = iv_index
    q = AllOf(
        (Match("***", ordered=True), Match("alpha")), ordered=True
    )
    out = intervals_topk(spark, root, {"q": q}, k=10)
    assert out.collect() == []
