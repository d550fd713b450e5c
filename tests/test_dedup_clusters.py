"""Near-dup connected-components clustering (functions/dedup.
near_dup_clusters): transitivity over a verified-pair CHAIN — A~B and
B~C above the Jaccard threshold while A~C is below it (values chosen so
the LSH emits all three candidates and exact verification prunes A-C),
so A and C share a cluster ONLY through label propagation, never through
a direct edge."""

from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions import dedup as dd

_T = [f"t{i}" for i in range(1, 60)]
DOCS = [
    # chain: J(A,B)=0.8667, J(B,C)=0.6471, J(A,C)=0.5556 (3-gram shingles)
    (10, " ".join(_T[0:30])),    # A
    (20, " ".join(_T[2:32])),    # B
    (30, " ".join(_T[8:38])),    # C
    # exact pair: J=1
    (40, "same words in this document exactly repeated here"),
    (41, "same words in this document exactly repeated here"),
    # isolated: shares no shingle with anything
    (50, "completely unrelated content about something else entirely"),
]


def _clusters(spark, threshold=0.6):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = dd.near_dup_clusters(
        docs, n=3, num_hashes=16, band_size=2, threshold=threshold
    )
    return {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}


def test_chain_transitivity_and_canonicals(spark):
    got = _clusters(spark)
    # A-C linked only through B; cluster id is the component min
    assert got[10] == (10, True)
    assert got[20] == (10, False)
    assert got[30] == (10, False)
    assert got[40] == (40, True)
    assert got[41] == (40, False)
    # singleton never appears
    assert 50 not in got


def test_direct_pairs_exclude_chain_ends(spark):
    """Sanity of the premise: the verified pair relation itself has no
    A-C edge at this threshold."""
    docs = _clusters.__globals__["DOCS"]
    sdf = dd.minhash_dedup(
        _spark_df(docs), n=3, num_hashes=16, band_size=2, threshold=0.6
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in sdf.collect()}
    assert (10, 20) in pairs and (20, 30) in pairs
    assert (10, 30) not in pairs


def _spark_df(docs):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_one_round_convergence_on_clique(spark):
    """Identical docs form a clique: propagation must converge (the
    early-stop path) and keep exactly one canonical."""
    docs = _spark_df([(i, "dup dup dup dup dup dup") for i in range(5)])
    out = dd.near_dup_clusters(docs, n=3, num_hashes=16, band_size=2)
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == set(range(5))
    assert all(r["cluster_id"] == 0 for r in rows)
    assert sum(r["is_canonical"] for r in rows) == 1
