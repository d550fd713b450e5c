"""Sketches (functions/sketches): hash-exact python references for
KMV / count-min / HLL, the sketches' defining inequalities (CMS never
underestimates; KMV exact below k), and accuracy sanity within the
algorithms' standard error bounds."""

import hashlib
import math

import pytest

from rt_etl_yahoo_search_engine_spark.functions.sketches import (
    HASH_BITS, cms_counts, hll_distinct, kmv_distinct,
)


def _h60(s, salt=None):
    base = f"{salt}|{s}" if salt is not None else s
    return int(hashlib.md5(base.encode()).hexdigest()[:15], 16)


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


VALUES = [f"user{i % 700}" for i in range(5000)]  # 700 distinct, skewed
HEAVY = VALUES + ["hot"] * 400 + ["warm"] * 150


def test_kmv_matches_python_and_bounds(spark):
    out = kmv_distinct(_df(spark, VALUES), "v", k=128).collect()[0]
    hashes = sorted({_h60(f"user{i}") for i in range(700)})
    kth = hashes[127]
    want = 127.0 / (kth / float(2 ** HASH_BITS))
    assert out["kth_hash"] == kth
    assert out["estimate"] == pytest.approx(want, rel=1e-12)
    assert out["exact"] == 700
    # KMV standard error ~ 1/sqrt(k-2) ~ 9%; allow 3 sigma
    assert abs(out["estimate"] - 700) / 700 < 0.27


def test_kmv_exact_below_k(spark):
    out = kmv_distinct(_df(spark, ["a", "b", "c", "a"]), "v",
                       k=16).collect()[0]
    assert out["n_kept"] == 3
    assert out["estimate"] == 3.0
    assert out["exact"] == 3


def test_cms_matches_python_and_never_underestimates(spark):
    depth, width = 4, 256
    out = {
        r["probe"]: (r["estimate"], r["exact"])
        for r in cms_counts(_df(spark, HEAVY), "v",
                            ["hot", "warm", "user0", "nosuch"],
                            depth=depth, width=width).collect()
    }
    # python CMS
    cells = {}
    for v in HEAVY:
        for i in range(depth):
            key = (i, _h60(v, str(i)) % width)
            cells[key] = cells.get(key, 0) + 1
    for probe in ("hot", "warm", "user0", "nosuch"):
        want = min(
            cells.get((i, _h60(probe, str(i)) % width), 0)
            for i in range(depth)
        )
        true = HEAVY.count(probe)
        assert out[probe][0] == want, probe
        assert out[probe][1] == true
        assert out[probe][0] >= true  # CMS property


def test_hll_matches_python(spark):
    p = 8
    m = 2 ** p
    out = hll_distinct(_df(spark, VALUES), "v", p=p).collect()[0]
    regs = {}
    low = HASH_BITS - p
    for i in range(700):
        h = _h60(f"user{i}")
        reg, rest = h % m, h // m
        rank = low + 1 if rest == 0 else low - rest.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rank)
    ssum = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / ssum
    v = m - len(regs)
    want = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    assert out["m"] == m
    assert out["v_zeros"] == v
    assert out["raw_estimate"] == pytest.approx(raw, rel=1e-12)
    assert out["estimate"] == pytest.approx(want, rel=1e-12)
    assert out["exact"] == 700
    # HLL standard error 1.04/sqrt(m) ~ 6.5%; allow 3 sigma
    assert abs(out["estimate"] - 700) / 700 < 0.20


def test_hll_small_range_is_linear_counting(spark):
    out = hll_distinct(_df(spark, ["a", "b", "c"]), "v", p=8).collect()[0]
    m, v = out["m"], out["v_zeros"]
    assert v == m - 3  # 3 distinct keys land in 3 registers
    assert out["estimate"] == pytest.approx(m * math.log(m / v), rel=1e-12)


def test_binned_quantiles_match_python_and_bound(spark):
    from rt_etl_yahoo_search_engine_spark.functions.sketches import (
        binned_quantiles,
    )

    vals = [float((i * 37) % 1000) / 3.0 for i in range(2000)]
    w = 5.0
    qs = [0.5, 0.9, 0.99]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["q"]: (r["estimate"], r["exact"])
           for r in binned_quantiles(df, "x", qs, bin_width=w).collect()}
    # python reference (identical contract)
    import math as _m
    bins = {}
    for v in vals:
        bins[_m.floor(v / w)] = bins.get(_m.floor(v / w), 0) + 1
    n = len(vals)
    for q in qs:
        r = q * (n - 1)
        cum = 0
        for b in sorted(bins):
            if r < cum + bins[b]:
                raw = b * w + w * (r - cum) / bins[b]
                want = min(raw, b * w + w)
                break
            cum += bins[b]
        assert out[q][0] == pytest.approx(want, abs=1e-9), q
        # bounded by bin width vs the exact percentile
        assert abs(out[q][0] - out[q][1]) <= w + 1e-9, q


def test_binned_quantiles_exact_when_bins_tiny(spark):
    from rt_etl_yahoo_search_engine_spark.functions.sketches import (
        binned_quantiles,
    )

    vals = [float(i) for i in range(101)]  # integers, bin width 1
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["q"]: (r["estimate"], r["exact"])
           for r in binned_quantiles(df, "x", [0.5, 0.25],
                                     bin_width=1.0).collect()}
    assert out[0.5][0] == pytest.approx(out[0.5][1], abs=1e-9)  # 50.0
    assert out[0.25][0] == pytest.approx(out[0.25][1], abs=1e-9)


def test_bloom_filter_no_false_negatives_and_python_parity(spark):
    from rt_etl_yahoo_search_engine_spark.functions.sketches import (
        bloom_filter,
    )

    members = [f"key{i}" for i in range(300)]
    probes = members[:20] + [f"absent{i}" for i in range(200)]
    out = {
        r["probe"]: (r["maybe_present"], r["actually_present"])
        for r in bloom_filter(_df(spark, members), "v", probes,
                              m_bits=2048, k_hashes=3).collect()
    }
    # python reference with the identical hashes
    bits = set()
    for v in members:
        for i in range(3):
            bits.add(_h60(v, f"b{i}") % 2048)
    fp = 0
    for p in probes:
        want = all(_h60(p, f"b{i}") % 2048 in bits for i in range(3))
        assert out[p][0] == want, p
        assert out[p][1] == (p in set(members))
        if out[p][1]:
            assert out[p][0]  # no false negatives
        elif out[p][0]:
            fp += 1
    # fp rate sanity: (1 - e^(-kn/m))^k ~ 8.7% at n=300,m=2048,k=3;
    # allow generous slack on 200 absent probes
    assert fp / 200 < 0.25
