"""Analysis chains (functions/analysis): Porter stemmer against the
official algorithm's published input/output pairs, stopword/shingle/
edge-ngram filters against python references, and the end-to-end
stemmed-index search path (query-time stemming hits morphological
variants)."""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.analysis import (
    edge_ngrams, porter_stem, remove_stopwords, shingles, stem_query,
    stem_text,
)
from rt_etl_yahoo_search_engine_spark.functions.text_analysis import STOPWORDS

# Input/output pairs from the published Porter test vocabulary
# (tartarus.org voc.txt/output.txt excerpts — the algorithm's own
# conformance fixtures).
PORTER_PAIRS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"),
    ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"), ("revival", "reviv"),
    ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


def test_porter_official_pairs():
    for w, want in PORTER_PAIRS:
        assert porter_stem(w) == want, w


def test_stem_text_and_query_agree(spark):
    rows = [(0, "relational databases are effective", "en"),
            (1, "the operator adjusted the controls", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["text"] for r in stem_text(df).collect()}
    for did, text, _ in rows:
        want = " ".join(porter_stem(t) for t in spec.tokenize(text))
        assert out[did] == want
        assert stem_query(text) == want


def test_stemmed_search_hits_variants(spark, tmp_path):
    from rt_etl_yahoo_search_engine_spark.operators.index_build import (
        build_index,
    )
    from rt_etl_yahoo_search_engine_spark.plans import bm25
    from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

    docs = [
        ("d0", "relational algebra generalizes joins", "en"),
        ("d1", "the relation of tables", "en"),
        ("d2", "unrelated words entirely", "en"),
        ("d3", "adjustable rates adjusted quickly", "en"),
    ]
    df = spark.createDataFrame(docs, "url string, text string, lang string")
    root = str(tmp_path / "stemidx")
    build_index(spark, stem_text(df), root, n_shards=2, n_buckets=2,
                tokenizer="text")
    dm = {r["doc_id"]: r["url"]
          for r in Catalog(root).read(spark, "docmap").collect()}
    out = bm25.topk(
        spark, root,
        {"q1": stem_query("relations"), "q2": stem_query("adjusting")},
        mode=spec.MODE_DISJUNCTIVE, k=10,
    )
    hits = {}
    for r in out.collect():
        hits.setdefault(r["query_id"], set()).add(dm[r["doc_id"]])
    assert hits["q1"] == {"d0", "d1"}   # relational + relation -> relat
    assert hits["q2"] == {"d3"}         # adjusting/adjustable/adjusted
    # control: 'unrelated' does NOT stem to 'relat' (unrelat)
    assert "d2" not in hits["q1"]


def test_remove_stopwords(spark):
    rows = [(0, "the cat and the dog on a mat", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    toks = remove_stopwords(df).collect()[0]["tokens"]
    want = [t for t in spec.tokenize(rows[0][1]) if t not in set(STOPWORDS)]
    assert toks == want


def test_shingles_match_python(spark):
    rows = [(0, "a b c d", "en"), (1, "x y", "en"), (2, "solo", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {}
    for r in shingles(df, n=2).collect():
        got.setdefault(r["doc_id"], []).append(r["shingle"])
    assert sorted(got[0]) == ["a_b", "b_c", "c_d"]
    assert got[1] == ["x_y"]
    assert 2 not in got  # single-token doc has no 2-shingles
    tri = {}
    for r in shingles(df, n=3).collect():
        tri.setdefault(r["doc_id"], []).append(r["shingle"])
    assert sorted(tri[0]) == ["a_b_c", "b_c_d"]


def test_edge_ngrams_match_python(spark):
    rows = [(0, "spark go", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(
        (r["term"], r["gram"]) for r in edge_ngrams(df, 2, 4).collect()
    )
    assert got == [("go", "go"), ("spark", "sp"), ("spark", "spa"),
                   ("spark", "spar")]
