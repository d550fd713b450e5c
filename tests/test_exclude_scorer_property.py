"""Property tests for the scorer's exclusion masks (minus-term queries) —
pure numpy level, no Spark.

Oracle: the UNMASKED scorer at k = whole range (itself verified
bit-identical to naive scoring by test_wand_property), minus the masked
doc_ids, truncated to k.  Masked paths under test: dense topk_set, the
chunked topk_sets matrix path (chunk=2 forces chunk boundaries), and the
budget-starved sparse fallback.  Also: out-of-range masks must leave
results BIT-identical to the unmasked call, and a mask covering every
match yields empty.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.codec import (
    encode_doc_ids,
    encode_varbyte,
)
from rt_etl_yahoo_search_engine_spark.operators.topk import (
    BatchScorer,
    decode_term_postings_stream,
)


def _blocks_pdf(idf, doc_ids, tfs, dls, avgdl, block_size=8):
    rows = []
    for s in range(0, len(doc_ids), block_size):
        e = min(s + block_size, len(doc_ids))
        ids = np.array(doc_ids[s:e])
        t = np.array(tfs[s:e])
        d = np.array(dls[s:e])
        parts = (t * (spec.K1 + 1.0)) / (
            t + spec.K1 * (1.0 - spec.B + spec.B * d / avgdl)
        )
        rows.append(
            {
                "shard": 0,
                "first_doc_id": ids[0],
                "last_doc_id": ids[-1],
                "block_max_part": parts.max(),
                "doc_ids_vb": encode_doc_ids(ids),
                "tfs_vb": encode_varbyte(t),
                "doc_lens_vb": encode_varbyte(d),
            }
        )
    return pd.DataFrame(rows)


def _tdata(postings, idfs, avgdl=25.0):
    return {
        t: decode_term_postings_stream(
            _blocks_pdf(idfs[t], *p, avgdl=avgdl), avgdl
        )
        for t, p in postings.items()
    }


def _oracle(scorer_factory, terms, k, mode, n_terms, mask, n_docs):
    """Unmasked full ranking -> drop masked -> first k."""
    d, s = scorer_factory().topk_set(terms, max(n_docs, k), mode, n_terms)
    bad = set(int(x) for x in (mask if mask is not None else []))
    pairs = [(int(dd), ss) for dd, ss in zip(d.tolist(), s.tolist())
             if int(dd) not in bad]
    return pairs[:k]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=1, max_value=300))
    n_terms = draw(st.integers(min_value=1, max_value=4))
    dl_map = {
        d: draw(st.integers(min_value=1, max_value=4)) * 10 for d in range(n_docs)
    }
    postings = {}
    for t in range(n_terms):
        docs = draw(
            st.lists(
                st.integers(min_value=0, max_value=n_docs - 1),
                min_size=1,
                max_size=min(n_docs, 80),
                unique=True,
            )
        )
        docs.sort()
        tfs = [draw(st.integers(min_value=1, max_value=3)) for _ in docs]
        postings[f"t{t}"] = (docs, tfs, [dl_map[d] for d in docs])
    k = draw(st.integers(min_value=1, max_value=12))
    mode = draw(st.sampled_from([spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE]))
    # mask: a random subset of doc ids (some matching, some not), possibly
    # empty, plus out-of-range ids
    mask_ids = draw(
        st.lists(st.integers(min_value=0, max_value=n_docs - 1),
                 min_size=0, max_size=40, unique=True)
    )
    oor = draw(st.booleans())
    return n_docs, postings, k, mode, sorted(mask_ids), oor


@settings(max_examples=250, deadline=None)
@given(corpus())
def test_masked_topk_set_and_sets_equal_filtered_oracle(c):
    n_docs, postings, k, mode, mask_ids, oor = c
    idfs = {t: spec.idf(n_docs, len(p[0])) for t, p in postings.items()}
    tdata = _tdata(postings, idfs)
    terms = sorted(postings)
    mask = np.array(mask_ids + ([n_docs + 10_000] if oor else []), dtype=np.int64)

    def fresh():
        return BatchScorer(tdata, idfs)

    want = _oracle(fresh, terms, k, mode, len(terms), mask, n_docs)
    d, s = fresh().topk_set(terms, k, mode, len(terms), mask)
    assert list(zip(d.tolist(), s.tolist())) == want

    # batch path, chunk=2, mask only on set 0; set 1 is the unmasked control
    sets = [terms, terms]
    got = fresh().topk_sets(sets, k, mode, chunk=2, masks=[mask, None])
    by_set: dict[int, list] = {0: [], 1: []}
    for si, dd, ss in zip(*[a.tolist() for a in got]):
        by_set[si].append((dd, ss))
    assert by_set[0] == want
    du, su = fresh().topk_set(terms, k, mode, len(terms))
    assert by_set[1] == list(zip(du.tolist(), su.tolist()))


def test_out_of_range_mask_is_bit_identical_noop():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(400, size=60, replace=False)).astype(np.int64)
    postings = {"a": (ids.tolist(), [2] * 60, [20] * 60)}
    idfs = {"a": spec.idf(400, 60)}
    tdata = _tdata(postings, idfs)
    mask = np.array([100_000, 200_000], dtype=np.int64)
    d0, s0 = BatchScorer(tdata, idfs).topk_set(["a"], 10, spec.MODE_DISJUNCTIVE, 1)
    d1, s1 = BatchScorer(tdata, idfs).topk_set(
        ["a"], 10, spec.MODE_DISJUNCTIVE, 1, mask
    )
    assert d0.tolist() == d1.tolist()
    assert s0.tolist() == s1.tolist()


def test_full_mask_empties_result():
    postings = {"a": ([1, 2, 3], [1, 1, 1], [10, 10, 10])}
    idfs = {"a": 2.0}
    tdata = _tdata(postings, idfs)
    mask = np.array([1, 2, 3], dtype=np.int64)
    d, s = BatchScorer(tdata, idfs).topk_set(
        ["a"], 5, spec.MODE_DISJUNCTIVE, 1, mask
    )
    assert len(d) == 0 and len(s) == 0
    si, dd, ss = BatchScorer(tdata, idfs).topk_sets(
        [["a"]], 5, spec.MODE_DISJUNCTIVE, masks=[mask]
    )
    assert len(si) == 0


def test_budget_starved_sparse_path_respects_mask():
    rng = np.random.default_rng(11)
    ids_a = np.sort(rng.choice(10_000_000, size=40, replace=False)).astype(np.int64)
    postings = {"a": (ids_a.tolist(), [2] * 40, [20] * 40)}
    idfs = {"a": 2.0}
    tdata = _tdata(postings, idfs)
    mask = ids_a[:15]  # mask the 15 lowest doc ids
    saved = BatchScorer.DENSE_BUDGET_BYTES
    BatchScorer.DENSE_BUDGET_BYTES = 1024
    try:
        want = _oracle(
            lambda: BatchScorer(tdata, idfs), ["a"], 10,
            spec.MODE_DISJUNCTIVE, 1, mask, 50,
        )
        d, s = BatchScorer(tdata, idfs).topk_set(
            ["a"], 10, spec.MODE_DISJUNCTIVE, 1, mask
        )
        assert list(zip(d.tolist(), s.tolist())) == want
        assert not (set(d.tolist()) & set(mask.tolist()))
    finally:
        BatchScorer.DENSE_BUDGET_BYTES = saved
