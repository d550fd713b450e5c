"""Full BPE training loop — functions/text_analysis.bpe_learn.

Checked against a from-scratch pure-Python BPE trainer (Sennrich et al.
2016 semantics: word-frequency table, overlap-counted adjacent pairs,
greedy left-to-right merge application, count-desc / 'left right'-asc
pick order) on corpora engineered to exercise overlap counting, merge
chaining, and tie-breaks.
"""

import re
from collections import Counter

from rt_etl_yahoo_search_engine_spark.functions.text_analysis import bpe_learn


def _py_bpe(texts, n_merges):
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z0-9]+", t.lower()))
    syms = {w: tuple(w) for w in words}
    merges = []
    for i in range(n_merges):
        stats = Counter()
        for w, cnt in words.items():
            s = syms[w]
            for j in range(len(s) - 1):
                stats[(s[j], s[j + 1])] += cnt
        if not stats:
            break
        (left, right), c = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((i, left, right, c))
        for w, s in syms.items():
            out, j = [], 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == left and s[j + 1] == right:
                    out.append(left + right)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            syms[w] = tuple(out)
    return merges


def _run(spark, texts, n_merges):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bpe_learn(df, n_merges=n_merges).collect()
    return sorted(
        (r.merge_idx, r.left_sym, r.right_sym, r.pair_count) for r in rows
    )


def test_matches_python_bpe_trainer(spark):
    texts = [
        "the theme of the thesis is thorough",
        "low lower lowest newest widest",
        "aaa aaaa aa baa",          # overlap counting: 'aaa' has two (a,a)
        "chat chats chatter chatty",
        "zz zz zz yy yy xx",        # tie-break territory
    ]
    assert _run(spark, texts, 10) == _py_bpe(texts, 10)


def test_merge_chaining_builds_multichar_symbols(spark):
    # 'ab' dominates, then ('ab','c') must win round 2 -> symbol 'abc'
    texts = ["abc abc abc abc abd"]
    got = _run(spark, texts, 3)
    assert got == _py_bpe(texts, 3)
    assert got[0][1:3] == ("a", "b")
    assert got[1][1:3] == ("ab", "c")


def test_exhaustion_stops_early(spark):
    # single 2-char word: one possible merge, then no pairs remain
    texts = ["xy xy"]
    got = _run(spark, texts, 5)
    assert got == _py_bpe(texts, 5)
    assert len(got) == 1


def test_bpe_encode_matches_python(spark):
    """bpe_encode: per-doc subword counts equal a greedy left-to-right
    non-overlapping merge application in pure python."""
    from rt_etl_yahoo_search_engine_spark import spec
    from rt_etl_yahoo_search_engine_spark.functions.text_analysis import (
        bpe_encode, bpe_learn,
    )

    rows = [
        (0, "the theme thesis then"),
        (1, "there other ethers"),
        (2, "a b c d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learn(df, n_merges=4).orderBy("merge_idx").collect()
    ]

    def apply_merges(word):
        syms = list(word)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    for did, text in rows:
        toks = spec.tokenize(text)
        want_bpe = sum(len(apply_merges(t)) for t in toks)
        assert got[did] == (len(toks), want_bpe), did
