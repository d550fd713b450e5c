"""Streaming EQL sequence detection — the earliest-chain funnel
(functions/events_agg.eql_sequence) as a CUSTOM STATEFUL operator on
``applyInPandasWithState``, emitting each completed sequence the moment
its last stage binds.

Semantics are IDENTICAL to the batch operator (the stream==batch twin
contract every streaming op in this repo honors): every stage-1 event
opens a candidate; each later stage binds to the earliest event of its
type strictly after the previous binding (same key); a candidate
completes iff all stages bind within ``maxspan_s`` of its first event.
Within one micro-batch events fold in (ts, event_id) order; open
candidates ride per-key state across batches, so a sequence spanning any
number of micro-batches is stitched exactly.  Events are assumed
non-late per key across batches (file/kafka arrival order), like the
sessionizer.

``maxspan_s`` is REQUIRED here (unlike batch, where it is optional):
expiry is what bounds state — a candidate whose deadline has passed can
never complete (all future events are later still) and is dropped the
moment a newer event proves it, so per-key state is bounded by the
number of stage-1 events inside one maxspan window.  An unbounded
streaming funnel would accumulate every click forever; the guard makes
that impossible by construction (the same loud-contract idea as
asof_join's ``unbounded=True`` opt-in).

Scale shape: one shuffle per micro-batch on the group key; state is the
open-candidate list per ACTIVE key (JSON in a single state column —
schema-stable for any number of stages); cost per batch is
O(batch x open candidates per touched key), independent of history.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("cands", T.StringType(), False)])


def _out_schema(k: int) -> T.StructType:
    fields = [T.StructField("user_id", T.LongType(), False)]
    fields += [
        T.StructField(f"e{j}_id", T.LongType(), False)
        for j in range(1, k + 1)
    ]
    fields += [
        T.StructField("start_epoch", T.LongType(), False),
        T.StructField("span_s", T.LongType(), False),
    ]
    return T.StructType(fields)


def _make_eql_fn(stages: list[str], maxspan_s: int, k: int):
    cols = (
        ["user_id"]
        + [f"e{j}_id" for j in range(1, k + 1)]
        + ["start_epoch", "span_s"]
    )

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        cands = json.loads(state.get[0]) if state.exists else []
        # cand: {"t1": first-event ts, "ids": bound event ids,
        #        "j": next stage index, "lt"/"le": last binding (ts, id)}
        rows = []
        parts = []
        for pdf in pdf_iter:
            parts.append(pdf[["ts_epoch", "event_id", "event_type"]])
        if parts:
            ev = pd.concat(parts).sort_values(["ts_epoch", "event_id"])
            for t, e, s in ev.itertuples(index=False):
                t, e = int(t), int(e)
                # expired candidates can never complete (future events
                # are later still) — this is what bounds state
                cands = [c for c in cands if t - c["t1"] <= maxspan_s]
                kept = []
                for c in cands:
                    if s == stages[c["j"]]:
                        ids = c["ids"] + [e]
                        if c["j"] + 1 == k:
                            rows.append(
                                (user_id, *ids, c["t1"], t - c["t1"])
                            )
                            continue  # completed: candidate retires
                        kept.append(
                            {
                                "t1": c["t1"],
                                "ids": ids,
                                "j": c["j"] + 1,
                                "lt": t,
                                "le": e,
                            }
                        )
                    else:
                        kept.append(c)
                cands = kept
                # opened AFTER advancing: this event can never bind a
                # later stage of the candidate it just opened
                # (strictly-after, as in the batch position order)
                if s == stages[0]:
                    cands.append(
                        {"t1": t, "ids": [e], "j": 1, "lt": t, "le": e}
                    )
        state.update((json.dumps(cands, separators=(",", ":")),))
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return fn


def eql_sequence_stream_df(
    events: DataFrame, stages: list[str], maxspan_s: int
) -> DataFrame:
    """events: STREAMING DataFrame with EVENTS_SCHEMA columns ->
    streaming DataFrame of completed sequences (append mode), equal to
    the batch eql_sequence over the same rows."""
    if len(stages) < 2:
        raise ValueError("eql_sequence needs >= 2 stages")
    if maxspan_s is None or maxspan_s <= 0:
        raise ValueError(
            "streaming eql_sequence requires maxspan_s > 0 — expiry is "
            "what bounds per-key state (see module docstring)"
        )
    k = len(stages)
    return events.groupBy("user_id").applyInPandasWithState(
        _make_eql_fn(list(stages), int(maxspan_s), k),
        outputStructType=_out_schema(k),
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def eql_sequence_stream(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    stages: list[str],
    maxspan_s: int,
    max_files_per_trigger: int = 1,
):
    """File-source wiring (one file per micro-batch by default so
    cross-batch candidate stitching is exercised).  Returns the
    StreamingQuery."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return (
        eql_sequence_stream_df(src, stages, maxspan_s)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
