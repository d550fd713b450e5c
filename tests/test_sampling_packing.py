"""Deterministic sampling (functions/sampling.py), sequence packing
(functions/packing.py), and benchmark decontamination
(functions/decontam.py) against pure-Python oracles."""

import hashlib

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.decontam import (
    contamination,
    decontaminate,
)
from rt_etl_yahoo_search_engine_spark.functions.packing import pack_sequences
from rt_etl_yahoo_search_engine_spark.functions.sampling import (
    deterministic_sample,
    stratified_sample,
)


def _kept(doc_id, fraction, salt="s0"):
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8]
    return h < format(min(int(fraction * 2**32), 2**32 - 1), "08x")


@pytest.fixture(scope="module")
def sample_docs(spark):
    rows = [(i, f"text {i}", ["web", "wiki", "news"][i % 3]) for i in range(500)]
    return (
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ),
        rows,
    )


def test_deterministic_sample_matches_hash_oracle(spark, sample_docs):
    df, rows = sample_docs
    got = {r["doc_id"] for r in deterministic_sample(df, 0.3).collect()}
    want = {i for i, _, _ in rows if _kept(i, 0.3)}
    assert got == want
    assert 0 < len(got) < len(rows)


def test_sample_reproducible_and_salt_independent(spark, sample_docs):
    df, _ = sample_docs
    a = {r["doc_id"] for r in deterministic_sample(df, 0.3, "s0").collect()}
    b = {r["doc_id"] for r in deterministic_sample(
        df.repartition(7), 0.3, "s0"
    ).collect()}
    assert a == b                        # layout-independent
    c = {r["doc_id"] for r in deterministic_sample(df, 0.3, "s1").collect()}
    assert a != c                        # salts give different samples


def test_sample_fraction_monotone(spark, sample_docs):
    """A smaller fraction's sample is a SUBSET of a larger one (same
    salt) — the property that makes hash-threshold samples growable."""
    df, _ = sample_docs
    small = {r["doc_id"] for r in deterministic_sample(df, 0.1).collect()}
    big = {r["doc_id"] for r in deterministic_sample(df, 0.5).collect()}
    assert small <= big


def test_stratified_sample(spark, sample_docs):
    df, rows = sample_docs
    fr = {"web": 1.0, "wiki": 0.4}
    got = {r["doc_id"] for r in stratified_sample(df, fr).collect()}
    want = {
        i for i, _, s in rows
        if _kept(i, fr.get(s, 0.0))
    }
    assert got == want
    srcs = {s for i, _, s in rows if i in got}
    assert "news" not in srcs            # default_fraction=0 drops


def test_pack_sequences_matches_python_oracle(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(3 + i % 5)), f"s{i % 2}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["chunk_id"], r["chunk_offset"])
        for r in pack_sequences(df, budget=10).collect()
    }
    want = {}
    for src in ("s0", "s1"):
        before = 0
        for i, text, s in sorted(rows):
            if s != src:
                continue
            n = len(spec.tokenize(text))
            want[i] = (n, before // 10, before % 10)
            before += n
    assert got == want


def test_pack_budget_rejected(spark):
    df = spark.createDataFrame([(1, "a", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_contamination_and_decontaminate(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h extra tail words"),    # contains bench gram
            (1, "a b c d e f g X h"),                   # broken gram: clean
            (2, "z y x w v u t s and a b c d e f g h"), # two bench grams
            (3, "totally unrelated text with no overlap at all here"),
            (4, "short"),                               # < n tokens: clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h"), (101, "z y x w v u t s")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_shared"]
        for r in contamination(docs, bench, n=8).collect()
    }
    assert got == {0: 1, 2: 2}
    clean = {r["doc_id"] for r in decontaminate(docs, bench, n=8).collect()}
    assert clean == {1, 3, 4}


def test_weighted_sample_matches_python(spark):
    """A-ES weighted sampling: keys, membership and order equal the
    python reference; zero/negative weights excluded; heavier items
    sampled more often across seeds."""
    import hashlib

    import pytest as _pytest

    from rt_etl_yahoo_search_engine_spark.functions.sampling import (
        weighted_sample,
    )

    rows = [(i, float((i % 7) + 1)) for i in range(200)] + [
        (900, 0.0), (901, -3.0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, wt double")

    def u(seed, i):
        h = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16)
        return (h + 1) / float(2 ** 60)

    got = [
        (r["id"], r["key"])
        for r in weighted_sample(df, "wt", 20, seed="t1")
        .orderBy("rank").collect()
    ]
    want = sorted(
        (
            (i, u("t1", i) ** (1.0 / w))
            for i, w in rows
            if w > 0
        ),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (gi, gk), (wi, wk) in zip(got, want):
        assert gk == _pytest.approx(wk, rel=1e-12)
    assert all(i not in (900, 901) for i, _ in got)

    # heavier weights overrepresented: mean weight of the sample should
    # exceed the population mean across several seeds
    pop_mean = sum(w for _, w in rows if w > 0) / 200
    for seed in ("a", "b", "c"):
        samp = weighted_sample(df, "wt", 40, seed=seed).collect()
        mean_w = sum(r["weight"] for r in samp) / len(samp)
        assert mean_w > pop_mean, seed


def test_select_by_budget_exact_prefix(spark):
    """Banded-offset running sum == the naive global-window answer, and
    the kept set is the exact greedy prefix (r3)."""
    from rt_etl_yahoo_search_engine_spark.functions.sampling import (
        select_by_budget,
    )

    rows = [
        (i, float((i * 37) % 100) / 100.0, 10 + (i * 13) % 50)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, nt long")
    budget = 2000
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in select_by_budget(df, "score", "nt", budget).collect()
    }
    # naive oracle
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    want, acc = {}, 0
    for d, _, nt in order:
        acc += nt
        if acc > budget:
            break
        want[d] = acc
    assert got == want


def test_select_by_budget_window_is_partitioned(spark):
    from rt_etl_yahoo_search_engine_spark.functions.sampling import (
        select_by_budget,
    )

    df = spark.createDataFrame(
        [(i, float(i % 7) / 7.0, 5) for i in range(50)],
        "doc_id long, score double, nt long",
    )
    out = select_by_budget(df, "score", "nt", 100)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for line in plan.splitlines():
        if line.strip().startswith("Arguments") and "windowspecdefinition" in line:
            assert "_band" in line.split("windowspecdefinition")[1][:60]
