"""eql_sequence (functions/events_agg): EQL-style earliest-chain funnel.

Ground truth is a from-scratch pure-Python implementation of the
documented semantics (every stage-1 event opens a candidate; each later
stage binds to the earliest matching event strictly after the previous
binding; complete iff all stages bind within maxspan of the first),
checked on a hand case and a seeded randomized sweep.
"""

import datetime as dt
import random

import pytest


def _brute(events, stages, maxspan_s=None):
    """events: list of (key, ts_epoch_s, eid, stage).  Returns the set of
    (key, e1..ek, start_epoch, span) tuples under earliest-chain rules."""
    out = set()
    by_key = {}
    for k, t, e, s in events:
        by_key.setdefault(k, []).append((t, e, s))
    for k, evs in by_key.items():
        evs.sort()
        for i, (t1, e1, s1) in enumerate(evs):
            if s1 != stages[0]:
                continue
            chain = [(t1, e1)]
            j = i
            ok = True
            for stage in stages[1:]:
                nxt = None
                for t, e, s in evs[j + 1:]:
                    if s == stage:
                        nxt = (t, e)
                        break
                if nxt is None:
                    ok = False
                    break
                if maxspan_s is not None and int(nxt[0]) - int(t1) > maxspan_s:
                    ok = False
                    break
                chain.append(nxt)
                j = evs.index((nxt[0], nxt[1], stage))
            if ok:
                out.add(
                    (k,) + tuple(e for _, e in chain)
                    + (int(t1), int(chain[-1][0]) - int(t1))
                )
    return out


def _run_spark(spark, events, stages, maxspan_s=None):
    from rt_etl_yahoo_search_engine_spark.functions.events_agg import (
        eql_sequence,
    )

    rows = [
        (int(e), dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), int(k), s)
        for k, t, e, s in events
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    base = int(dt.datetime(2024, 1, 1).timestamp())
    got = set()
    k = len(stages)
    for r in eql_sequence(df, stages, maxspan_s=maxspan_s).collect():
        got.add(
            (r["key"],)
            + tuple(r[f"e{j}_id"] for j in range(1, k + 1))
            + (
                int(r["start_ts"].timestamp()) - base,
                r["span_s"],
            )
        )
    return got


def test_eql_hand_case(spark):
    # user 1: click(0) view(10) click(20) purchase(30) view(40) purchase(50)
    ev = [
        (1, 0, 100, "click"),
        (1, 10, 101, "view"),
        (1, 20, 102, "click"),
        (1, 30, 103, "purchase"),
        (1, 40, 104, "view"),
        (1, 50, 105, "purchase"),
        (2, 5, 200, "click"),  # user 2: no view -> no sequence
        (2, 6, 201, "purchase"),
    ]
    got = _run_spark(spark, ev, ["click", "view", "purchase"])
    # click@0 -> view@10 -> purchase@30; click@20 -> view@40 -> purchase@50
    assert got == {
        (1, 100, 101, 103, 0, 30),
        (1, 102, 104, 105, 20, 30),
    }


def test_eql_maxspan_prunes_at_each_stage(spark):
    ev = [
        (1, 0, 1, "a"),
        (1, 100, 2, "b"),  # binds, but 100 > 50 -> pruned at stage 2
        (1, 120, 3, "c"),
        (3, 0, 30, "a"),
        (3, 10, 31, "b"),
        (3, 40, 32, "c"),  # within 50 -> kept
    ]
    got = _run_spark(spark, ev, ["a", "b", "c"], maxspan_s=50)
    assert got == {(3, 30, 31, 32, 0, 40)}


def test_eql_randomized_vs_brute(spark):
    rng = random.Random(7)
    stages = ["x", "y", "z"]
    ev = []
    eid = 0
    for k in range(6):
        for _ in range(rng.randint(5, 25)):
            ev.append(
                (k, rng.randint(0, 500), eid, rng.choice(["x", "y", "z", "w"]))
            )
            eid += 1
    for span in (None, 60, 200):
        assert _run_spark(spark, ev, stages, maxspan_s=span) == _brute(
            ev, stages, maxspan_s=span
        ), f"maxspan={span}"


def test_eql_two_stage_and_validation(spark):
    ev = [(1, 0, 1, "a"), (1, 5, 2, "b")]
    got = _run_spark(spark, ev, ["a", "b"])
    assert got == {(1, 1, 2, 0, 5)}
    from rt_etl_yahoo_search_engine_spark.functions.events_agg import (
        eql_sequence,
    )

    with pytest.raises(ValueError):
        eql_sequence(None, ["only_one"])
