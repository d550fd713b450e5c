"""Query-surface edge cases: unknown terms, empty queries, k > corpus.

The reference's serving layer returns an empty result set rather than
erroring when a search yields nothing (ref src/router.py result path);
both our distributed and serving paths must do the same, in both modes.
"""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_unknown_and_empty_queries_distributed(spark, index_dir, mode):
    cases = {
        "unknown_only": "zzzzqqqxx yyyyzzzww",
        "empty_string": "",
    }
    for qid, text in cases.items():
        rows = topk(spark, index_dir, {qid: text}, mode=mode, k=5).collect()
        assert rows == [], (qid, mode)
    assert topk(spark, index_dir, {}, mode=mode, k=5).collect() == []


def test_conjunctive_mixed_unknown_is_empty(spark, index_dir):
    """A conjunctive query containing one indexed and one unknown term
    matches no document (no doc contains the unknown term)."""
    rows = topk(
        spark, index_dir, {"q": "zzzzqqqxx Starbucks"},
        mode=spec.MODE_CONJUNCTIVE, k=5,
    ).collect()
    assert rows == []


def test_empty_result_keeps_requested_columns(spark, index_dir):
    """The no-hit early returns must carry the same schema as the full path:
    an all-out-of-vocab batch with with_url=True (regression: broke
    phrase_topk's re-rank select on such batches)."""
    out = topk(
        spark, index_dir, {"q": "zzzzqqqxx yyyyzzzww"},
        mode=spec.MODE_CONJUNCTIVE, k=5, with_url=True,
    )
    assert out.columns == ["query_id", "rank", "doc_id", "url", "score"]
    assert out.collect() == []
    fields = spark.createDataFrame(
        [], "url string, seq int, body string"
    )
    outf = topk(
        spark, index_dir, {"q": "zzzzqqqxx"}, k=5, fields=fields,
    )
    assert outf.columns == [
        "query_id", "rank", "doc_id", "url", "score", "seq", "body"
    ]
    assert outf.collect() == []


def test_huge_k_returns_all_matches(spark, index_dir):
    rows = topk(
        spark, index_dir, {"q": "Starbucks"},
        mode=spec.MODE_DISJUNCTIVE, k=10**6,
    ).collect()
    assert 0 < len(rows) < 10**6
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_unknown_and_empty_queries_serve(index_dir, mode):
    s = LocalSearcher(index_dir)
    for text in ("", "zzzzqqqxx", "zzzzqqqxx Starbucks"):
        if mode == spec.MODE_DISJUNCTIVE and "Starbucks" in text:
            continue  # disjunctive mixed case legitimately matches
        assert s.search(text, k=5, mode=mode) == []
