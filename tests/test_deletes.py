"""Document deletion (operators/deletes.py):

  * delete_docs tombstones by url or doc id; queries on every path
    (distributed topk, oracle, serving, match stats) drop the deleted
    docs BEFORE top-k / counting, while the surviving docs' scores are
    UNCHANGED (Lucene semantics: stats keep counting deleted docs until
    a purge);
  * deleting is idempotent and unknown urls are no-ops;
  * deletion composes with segment extension (deleted base docs stay
    gone, new docs are searchable; optimized path == exhaustive oracle);
  * compact_index physically purges: afterwards queries equal a FRESH
    build over the live documents (ids keep their holes; n_docs stays
    the id high-water mark).
"""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.deletes import (
    delete_by_query,
    delete_docs,
    update_docs,
)
from rt_etl_yahoo_search_engine_spark.operators.index_build import (
    build_index,
    compact_index,
    extend_index,
)
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk, topk_oracle
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher
from rt_etl_yahoo_search_engine_spark.plans.stats import match_counts, match_docs
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog
from rt_etl_yahoo_search_engine_spark.sources.synth import (
    PAGES_SCHEMA,
    synth_pages_df,
    synth_pages_pandas,
)

N_PAGES = 330  # one generation; slices must come from it (synth content
BASE_CUT = "https://synth.example/en/00000200"  # depends on (n, parts))


def _rows(df):
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in df.collect()
    }


def _mask_rerank(pre: dict, deleted: set, k: int) -> dict:
    """Expected post-delete result: drop deleted docs from the pre-delete
    ranking, shift ranks up, scores UNTOUCHED (frozen statistics)."""
    out = {}
    by_q: dict = {}
    for (qid, rank), (doc, score) in sorted(pre.items()):
        by_q.setdefault(qid, []).append((rank, doc, score))
    for qid, rows in by_q.items():
        live = [(d, s) for _, d, s in sorted(rows) if d not in deleted]
        for i, (d, s) in enumerate(live[:k]):
            out[(qid, i + 1)] = (d, s)
    return out


@pytest.fixture(scope="module")
def delidx(spark, tmp_path_factory):
    """One synth generation; a masked index (delete, no compact, positional
    sidecar) plus pre-delete baselines (BM25 / phrase / NEAR / match sets)
    and the chosen victims."""
    from rt_etl_yahoo_search_engine_spark.operators.positions import (
        build_positions,
    )
    from rt_etl_yahoo_search_engine_spark.plans.near import near_topk
    from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_topk

    tmp = tmp_path_factory.mktemp("deletes")
    pages = str(tmp / "pages")
    synth_pages_df(spark, N_PAGES, num_partitions=3).write.parquet(pages)
    root = str(tmp / "idx")
    build_index(spark, pages, root, n_shards=3, n_buckets=4)
    build_positions(spark, pages, root)
    # pre-delete state, deep ranking so re-ranking after the mask is exact
    pre = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=40))
    qids = sorted({q for q, _ in pre})
    # a phrase guaranteed to match: a token run lifted from an indexed doc
    # (REFERENCE_QUERIES texts rarely occur adjacently in synth pages)
    from rt_etl_yahoo_search_engine_spark.functions.extract import page_text_df

    texts = (
        Catalog(root).read(spark, "docmap")
        .join(page_text_df(spark.read.parquet(pages)), "url")
        .select("doc_id", "text")
        .collect()
    )
    bigram = next(
        " ".join(spec.tokenize(r["text"])[3:5])
        for r in sorted(texts, key=lambda r: r["doc_id"])
        if len(spec.tokenize(r["text"])) >= 8
    )
    phrase_q = {"ph": bigram}
    pre_phrase = _rows(
        phrase_topk(spark, root, phrase_q, k=40, verify="positions")
    )
    pre_near = _rows(near_topk(spark, root, phrase_q, window=8, k=40))
    pre_match: dict = {}
    for r in match_docs(spark, root, spec.REFERENCE_QUERIES).collect():
        pre_match.setdefault(r["query_id"], set()).add(r["doc_id"])
    # victims: three distinct docs that must actually change results —
    # the phrase plan's #1 hit (if any), then top BM25 ranks; first two
    # go by url, the third by doc id
    victims: list = []
    keys = [(qids[0], 1), (qids[1], 1), (qids[0], 2), (qids[1], 2),
            (qids[0], 3)]
    for d in ([pre_phrase[("ph", 1)][0]] if ("ph", 1) in pre_phrase
              else []) + [pre[k][0] for k in keys]:
        if d not in victims:
            victims.append(d)
        if len(victims) == 3:
            break
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    n1 = delete_docs(spark, root, urls=[docmap[d] for d in victims[:2]])
    n2 = delete_docs(spark, root, doc_ids=[victims[2]])
    assert (n1, n2) == (2, 3)
    return {
        "root": root, "pages": pages, "pre": pre, "pre_match": pre_match,
        "victims": set(victims), "phrase_q": phrase_q,
        "pre_phrase": pre_phrase, "pre_near": pre_near,
    }


def test_distributed_topk_masks_deleted(spark, delidx):
    root, pre, victims = delidx["root"], delidx["pre"], delidx["victims"]
    got = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=10))
    want = _mask_rerank(pre, victims, k=10)
    assert got == want
    assert all(d not in victims for d, _ in got.values())


def test_oracle_path_masks_deleted(spark, delidx):
    root, pre, victims = delidx["root"], delidx["pre"], delidx["victims"]
    got = _rows(topk_oracle(spark, root, spec.REFERENCE_QUERIES, k=10))
    want = _mask_rerank(pre, victims, k=10)
    for key in want:
        assert got[key][0] == want[key][0]
        assert got[key][1] == pytest.approx(want[key][1], abs=1e-9)
    assert set(got) == set(want)


def test_serve_masks_deleted(spark, delidx):
    root, pre, victims = delidx["root"], delidx["pre"], delidx["victims"]
    s = LocalSearcher(root)
    want = _mask_rerank(pre, victims, k=10)
    for qid, text in spec.REFERENCE_QUERIES.items():
        got = s.search(text, k=10)
        exp = [
            (rank, doc) for (q, rank), (doc, _) in sorted(want.items())
            if q == qid
        ]
        assert [(r, d) for r, d, _ in got] == exp
        for r, d, score in got:
            assert score == pytest.approx(want[(qid, r)][1], abs=1e-9)


def test_match_stats_exclude_deleted(spark, delidx):
    root, pre_match, victims = (
        delidx["root"], delidx["pre_match"], delidx["victims"]
    )
    got_docs: dict = {}
    for r in match_docs(spark, root, spec.REFERENCE_QUERIES).collect():
        got_docs.setdefault(r["query_id"], set()).add(r["doc_id"])
    counts = {
        r["query_id"]: r["n_hits"]
        for r in match_counts(spark, root, spec.REFERENCE_QUERIES).collect()
    }
    for qid, docs in pre_match.items():
        live = docs - victims
        if live:
            assert got_docs[qid] == live
            assert counts[qid] == len(live)
        else:
            assert qid not in got_docs and qid not in counts


def test_phrase_and_near_mask_deleted(spark, delidx):
    """Positional plans inherit the tombstone mask through their candidate
    retrieval (plans/bm25.topk) and the serving path through its live-docs
    set: phrase and NEAR results equal pre-delete minus victims, frozen
    scores.  The fixture guarantees a victim inside the phrase result set."""
    from rt_etl_yahoo_search_engine_spark.plans.near import near_topk
    from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_topk

    root, victims = delidx["root"], delidx["victims"]
    phrase_q, pre_phrase = delidx["phrase_q"], delidx["pre_phrase"]
    pre_near = delidx["pre_near"]
    assert any(d in victims for d, _ in pre_phrase.values())

    got = _rows(phrase_topk(spark, root, phrase_q, k=10, verify="positions"))
    assert got == _mask_rerank(pre_phrase, victims, k=10)
    got = _rows(near_topk(spark, root, phrase_q, window=8, k=10))
    assert got == _mask_rerank(pre_near, victims, k=10)

    # serving path agrees (search_phrase routes through the masked scorer)
    s = LocalSearcher(root)
    (qid, text), = phrase_q.items()
    want = _mask_rerank(pre_phrase, victims, k=10)
    exp = [(r, d) for (q, r), (d, _) in sorted(want.items()) if q == qid]
    assert [(r, d) for r, d, _ in s.search_phrase(text, k=10)] == exp


def test_delete_idempotent_and_unknown_noop(spark, delidx):
    root, victims = delidx["root"], delidx["victims"]
    reg0 = Catalog(root).read_registry()
    # re-deleting the same doc and deleting an unknown url change nothing
    n = delete_docs(spark, root, doc_ids=[sorted(victims)[0]])
    assert n == reg0["n_deleted"] == 3
    n = delete_docs(spark, root, urls=["https://synth.example/en/zzz-none"])
    assert n == 3
    got = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=10))
    assert all(d not in victims for d, _ in got.values())


def test_delete_requires_exactly_one_selector(spark, delidx):
    root = delidx["root"]
    with pytest.raises(ValueError):
        delete_docs(spark, root)
    with pytest.raises(ValueError):
        delete_docs(spark, root, urls=["u"], doc_ids=[1])


def test_delete_then_extend_then_query(spark, tmp_path_factory):
    """Deletes on the base survive a segment extension; the optimized path
    stays identical to the exhaustive oracle (which recomputes stats the
    registry way)."""
    tmp = tmp_path_factory.mktemp("del_ext")
    whole = synth_pages_df(spark, N_PAGES, num_partitions=3)
    base, delta = str(tmp / "base"), str(tmp / "delta")
    whole.filter(F.col("url") < BASE_CUT).write.parquet(base)
    whole.filter(F.col("url") >= BASE_CUT).write.parquet(delta)
    root = str(tmp / "idx")
    build_index(spark, base, root, n_shards=3, n_buckets=4)
    pre = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=5))
    victim = pre[(sorted({q for q, _ in pre})[0], 1)][0]
    delete_docs(spark, root, doc_ids=[victim])
    n_base = int(Catalog(root).read_registry()["n_docs"])
    extend_index(spark, delta, root)

    got = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=10))
    assert all(d != victim for d, _ in got.values())
    # new-segment docs (ids >= base count) are searchable
    assert any(d >= n_base for d, _ in got.values())
    want = _rows(topk_oracle(spark, root, spec.REFERENCE_QUERIES, k=10))
    assert set(got) == set(want)
    for key, (doc, score) in got.items():
        assert doc == want[key][0]
        assert score == pytest.approx(want[key][1], abs=1e-9)
    # serving path agrees after extension + deletion
    s = LocalSearcher(root)
    for qid, text in spec.REFERENCE_QUERIES.items():
        exp = [(r, d) for (q, r), (d, _) in sorted(got.items()) if q == qid]
        assert [(r, d) for r, d, _ in s.search(text, k=10)] == exp


def test_searcher_refresh_sees_new_commits(spark, tmp_path_factory):
    """LocalSearcher.refresh (Lucene's reopen-if-changed): a no-op while
    nothing committed, the open searcher keeps serving its stale snapshot
    across a delete commit, and one refresh() makes the tombstones
    visible with scores frozen."""
    tmp = tmp_path_factory.mktemp("refresh")
    pages = str(tmp / "pages")
    synth_pages_df(spark, 120, num_partitions=2).write.parquet(pages)
    root = str(tmp / "idx")
    build_index(spark, pages, root, n_shards=2, n_buckets=4)
    s = LocalSearcher(root)
    qid, text = sorted(spec.REFERENCE_QUERIES.items())[0]
    pre = s.search(text, k=6)
    assert pre
    victim = pre[0][1]
    assert s.refresh() is False  # nothing committed since open

    delete_docs(spark, root, doc_ids=[victim])
    # the open searcher still serves its snapshot (live-docs set cached)
    assert s.search(text, k=6) == pre
    assert s.refresh() is True
    post = s.search(text, k=5)
    want = [
        (i + 1, d, sc)
        for i, (_, d, sc) in enumerate(
            [row for row in pre if row[1] != victim][:5]
        )
    ]
    assert post == want
    assert s.refresh() is False  # idempotent until the next commit


def test_delete_by_query(spark, tmp_path_factory):
    """delete_by_query tombstones the exact full match set of a search
    (conjunctive by default): the query then matches nothing, other
    queries lose exactly the overlapping docs with scores frozen, and a
    repeat of the same delete is a no-op."""
    tmp = tmp_path_factory.mktemp("delq")
    pages = str(tmp / "pages")
    synth_pages_df(spark, N_PAGES, num_partitions=3).write.parquet(pages)
    root = str(tmp / "idx")
    build_index(spark, pages, root, n_shards=3, n_buckets=4)
    qid, text = sorted(spec.REFERENCE_QUERIES.items())[0]
    pre = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=40))
    victims = {
        r["doc_id"]
        for r in match_docs(
            spark, root, {qid: text}, mode=spec.MODE_CONJUNCTIVE
        ).collect()
    }
    assert victims
    n = delete_by_query(spark, root, text)
    assert n == len(victims)

    # the deleted query's conjunctive match set is now empty
    assert not match_docs(
        spark, root, {qid: text}, mode=spec.MODE_CONJUNCTIVE
    ).count()
    # every query's ranking equals pre-delete minus the victims, frozen
    got = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=10))
    assert got == _mask_rerank(pre, victims, k=10)
    # repeating the delete is a no-op (match set already masked)
    reg0 = Catalog(root).read_registry()
    assert delete_by_query(spark, root, text) == 0
    assert Catalog(root).read_registry() == reg0


def test_update_docs_latest_wins(spark, tmp_path_factory):
    """update_docs (upsert): the batch's urls answer queries with their NEW
    content only (old versions tombstoned, new appended — latest wins), a
    url not in the index is a plain insert, the optimized path stays
    oracle-identical, a source_id replay is a full no-op, and compaction
    makes the index equal a fresh build over the updated corpus."""
    tmp = tmp_path_factory.mktemp("upd")
    base_pd = synth_pages_pandas(N_PAGES)
    pages = str(tmp / "pages")
    spark.createDataFrame(base_pd, schema=PAGES_SCHEMA).write.parquet(pages)
    root = str(tmp / "idx")
    build_index(spark, pages, root, n_shards=3, n_buckets=4)
    pre = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=5))
    qids = sorted({q for q, _ in pre})
    victims: list = []
    for key in [(qids[0], 1), (qids[1], 1), (qids[0], 2), (qids[1], 2)]:
        d = pre[key][0]
        if d not in victims:
            victims.append(d)
        if len(victims) == 2:
            break
    victims = sorted(victims)
    assert len(victims) == 2
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    victim_urls = [docmap[d] for d in victims]

    # replacement content: fresh deterministic pages from BEYOND the corpus
    # (all 'en' — N_PAGES..N_PAGES+2 avoid the i%50==49 'xx' slice), with
    # the victims' urls swapped in; the third row keeps its own url (an
    # INSERT riding the same batch)
    upd_pd = synth_pages_pandas(3, start=N_PAGES)
    assert list(upd_pd["lang"]) == ["en"] * 3
    upd_pd.loc[0, "url"] = victim_urls[0]
    upd_pd.loc[1, "url"] = victim_urls[1]
    new_url = upd_pd.loc[2, "url"]
    upd_path = str(tmp / "upd")
    spark.createDataFrame(upd_pd, schema=PAGES_SCHEMA).write.parquet(upd_path)

    n_base = int(Catalog(root).read_registry()["n_docs"])
    n_stale = update_docs(spark, root, upd_path, source_id="b1")
    assert n_stale == 2

    # old versions gone from results; updated urls resolve to NEW doc ids
    got = topk(
        spark, root, spec.REFERENCE_QUERIES, k=10, with_url=True
    ).collect()
    assert all(r["doc_id"] not in victims for r in got)
    url_ids: dict = {}
    for r in (
        Catalog(root)
        .read(spark, *Catalog(root).read_registry()["docmap_dirs"])
        .collect()
    ):
        url_ids.setdefault(r["url"], set()).add(r["doc_id"])
    assert all(i >= n_base for i in url_ids[new_url])  # insert landed
    for u, old in zip(victim_urls, victims):
        # both versions sit in the docmap (append-only); only the new one
        # may appear in results
        assert any(i >= n_base for i in url_ids[u]) and old in url_ids[u]
    for r in got:
        if r["url"] in victim_urls:
            assert r["doc_id"] >= n_base

    # optimized path == exhaustive oracle after the upsert
    opt = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=10))
    orc = _rows(topk_oracle(spark, root, spec.REFERENCE_QUERIES, k=10))
    assert set(opt) == set(orc)
    for key, (doc, score) in opt.items():
        assert doc == orc[key][0]
        assert score == pytest.approx(orc[key][1], abs=1e-9)

    # exactly-once replay: same source_id changes nothing at all (and
    # tombstones nothing new)
    reg_before = Catalog(root).read_registry()
    assert update_docs(spark, root, upd_path, source_id="b1") == 0
    assert Catalog(root).read_registry() == reg_before

    # purge + compare against a fresh build over the UPDATED corpus
    import pandas as pd

    compact_index(spark, root, prune=True)
    upd_corpus_pd = base_pd.copy()
    for i in range(3):
        row = upd_pd.iloc[i]
        m = upd_corpus_pd["url"] == row["url"]
        if m.any():
            upd_corpus_pd.loc[m, "html"] = [row["html"]]
        else:
            upd_corpus_pd = pd.concat(
                [upd_corpus_pd, upd_pd.iloc[[i]]], ignore_index=True
            )
    fresh_pages = str(tmp / "fresh_pages")
    spark.createDataFrame(
        upd_corpus_pd, schema=PAGES_SCHEMA
    ).write.parquet(fresh_pages)
    fresh_root = str(tmp / "fresh")
    build_index(spark, fresh_pages, fresh_root, n_shards=3, n_buckets=4)
    got = topk(
        spark, root, spec.REFERENCE_QUERIES, k=10, with_url=True
    ).collect()
    want = topk(
        spark, fresh_root, spec.REFERENCE_QUERIES, k=10, with_url=True
    ).collect()
    gm = {(r["query_id"], r["rank"]): (r["url"], r["score"]) for r in got}
    wm = {(r["query_id"], r["rank"]): (r["url"], r["score"]) for r in want}
    assert set(gm) == set(wm)
    for key, (url, score) in gm.items():
        assert url == wm[key][0], key
        assert score == pytest.approx(wm[key][1], abs=1e-9), key


def test_purge_compaction_equals_fresh_build(spark, tmp_path_factory):
    """compact_index on a tombstoned index physically reclaims: results
    equal a fresh build over the live documents (compared by url — the
    purged index keeps its id holes), and the registry resets."""
    tmp = tmp_path_factory.mktemp("purge")
    whole = synth_pages_df(spark, N_PAGES, num_partitions=3)
    pages = str(tmp / "pages")
    whole.write.parquet(pages)
    root = str(tmp / "idx")
    build_index(spark, pages, root, n_shards=3, n_buckets=4)
    pre = _rows(topk(spark, root, spec.REFERENCE_QUERIES, k=5))
    qids = sorted({q for q, _ in pre})
    victims = {pre[(qids[0], 1)][0], pre[(qids[2], 3)][0]}
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    victim_urls = {docmap[d] for d in victims}
    delete_docs(spark, root, doc_ids=sorted(victims))
    compact_index(spark, root, prune=True)

    reg = Catalog(root).read_registry()
    assert reg["deleted_dirs"] == [] and reg["n_deleted"] == 0
    n_total = int(reg["n_docs"])
    assert reg["n_live"] == n_total - len(victims)  # ids keep their holes

    fresh_root = str(tmp / "fresh")
    live_pages = str(tmp / "live_pages")
    whole.filter(~F.col("url").isin(*victim_urls)).write.parquet(live_pages)
    build_index(spark, live_pages, fresh_root, n_shards=3, n_buckets=4)

    for mode in (spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE):
        got = topk(
            spark, root, spec.REFERENCE_QUERIES, mode=mode, k=10, with_url=True
        ).collect()
        want = topk(
            spark, fresh_root, spec.REFERENCE_QUERIES, mode=mode, k=10,
            with_url=True,
        ).collect()
        gm = {(r["query_id"], r["rank"]): (r["url"], r["score"]) for r in got}
        wm = {(r["query_id"], r["rank"]): (r["url"], r["score"]) for r in want}
        assert set(gm) == set(wm)
        for key, (url, score) in gm.items():
            assert url == wm[key][0], key
            assert score == pytest.approx(wm[key][1], abs=1e-9), key
    # a second compaction of the purged index is a no-op (tombstones are
    # gone from the rebuild source, not just masked)
    ver = reg["version"]
    compact_index(spark, root)
    assert Catalog(root).read_registry()["version"] == ver
