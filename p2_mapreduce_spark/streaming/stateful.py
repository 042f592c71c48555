"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

This is the streaming twin of :func:`p2_mapreduce_spark.streaming.events.
sessionize` as an *arbitrary stateful* operator — the escape hatch for
semantics the built-in ``session_window`` can't express (per-session
custom features, early emission policies, side outputs).  State is one
fixed-size row per active (user) key; event-time timeouts bound state on
an unbounded stream: a session closes either when a later event of the
same user arrives past the gap, or when the watermark passes
session_end + gap (timeout path).

Scale notes: state is keyed and partitioned by user_id (one shuffle);
each micro-batch touches only keys with new events plus fired timeouts.
The Python hop is Arrow-batched.  Skewed users are a single state row —
not a hotspot.  At 100 TB of history the *batch* operator does the
backfill; this operator owns the live tail.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
#: (session_start_us, last_event_us, n_events, sum_value)
STATE_SCHEMA = "start long, last long, n long, s double"

_US_PER_MIN = 60 * 1_000_000


def _sessionize_fn(gap_minutes: int):
    gap_us = gap_minutes * _US_PER_MIN

    def fn(
        key: Tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is final
            if state.exists:
                closed.append(tuple(state.get))
            state.remove()
        else:
            rows = pd.concat(list(pdf_iter), ignore_index=True)
            rows = rows.sort_values(["ts", "event_id"])
            # datetime64 unit varies by pandas/Arrow version — normalize
            ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            vals = rows["value"].astype("float64")

            cur = tuple(state.get) if state.exists else None
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                if cur is None:
                    cur = (t, t, 1, v)
                elif t - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (t, t, 1, v)
                else:
                    cur = (cur[0], t, cur[2] + 1, cur[3] + v)
            state.update(cur)
            # fire when event time passes the session's close boundary
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)  # ms

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(events_stream: DataFrame, gap_minutes: int = 30,
                      watermark: str = "0 seconds") -> DataFrame:
    """Streaming gap-sessionization over an events stream (needs columns
    user_id, ts, event_id, value).  Emits one row per CLOSED session
    (append mode); open sessions stay in state until a later event or the
    event-time timeout closes them."""
    from p2_mapreduce_spark.streaming.events import as_event_time

    return (
        as_event_time(events_stream).withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


RUNNING_OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, max_value double"
)
#: (n_events, sum as exact integer cents, running max)
RUNNING_STATE_SCHEMA = "n long, cents long, mx double"


def _running_totals_fn(
    key, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents, mx = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdf_iter:
        n += int(len(pdf))
        # 2-decimal telemetry: accumulate exact integer cents, so the
        # running sum is order/partitioning-independent (the dsum
        # protocol transplanted into streaming state)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, cents, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [cents / 100.0],
            "max_value": [mx],
        }
    )


def running_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals changelog: each micro-batch
    emits the updated ``(count, sum, max)`` for exactly the users it
    touched (update mode) — the live materialized-aggregate pattern that
    pairs with :func:`p2_mapreduce_spark.operators.merge.agg_state` for
    batch backfill.

    The exact-cents accumulator makes the emitted running sum equal to
    the batch ``dsum`` bit-for-bit at every prefix: ``cents/100.0`` and
    ``CAST(SUM(DECIMAL(18,2)) AS DOUBLE)`` are the same correctly-rounded
    rational.  State is one fixed-size tuple per user; output is sized by
    per-batch activity, not by keyspace.

    Implemented on ``applyInPandasWithState``.  Spark 4's successor API
    (``transformWithStateInPandas`` — typed state handles, timers, TTL)
    expresses the same operator, but its PySpark driver worker needs the
    ``protobuf`` package, which this container does not ship (import
    fails inside the worker with STREAMING_PYTHON_RUNNER_INITIALIZATION
    _FAILURE) — same policy as the stubbed media codecs: the available
    engine path is the tested one.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _protobuf_available() -> bool:
    import importlib.util

    try:
        # find_spec on a dotted name imports the parent package, which
        # itself raises when 'google' is absent entirely
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """Spark 4 ``transformWithStateInPandas`` port of
    :func:`running_totals_stream`'s kernel — typed ValueState handle,
    same exact-cents accumulator, same update-mode changelog contract.
    Kept current so the migration off ``applyInPandasWithState`` is a
    one-line swap the moment the container ships ``protobuf`` (VERDICT
    r02 item 9; the gap is pinned by a skip-marked test)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", RUNNING_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        got = self._state.get()
        n, cents, mx = got if got is not None else (0, 0, float("-inf"))
        for pdf in rows:
            n += int(len(pdf))
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            mx = max(mx, float(pdf["value"].max()))
        self._state.update((n, cents, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [cents / 100.0],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream_tws(events_stream: DataFrame) -> DataFrame:
    """:func:`running_totals_stream` on the Spark 4 successor API
    (``transformWithStateInPandas`` — typed state handles, timers, TTL).

    The PySpark side of that API starts a state-server protocol inside
    each Python worker that imports ``google.protobuf``; without the
    package the query dies at start with
    ``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE`` wrapping
    ``ModuleNotFoundError: No module named 'google'``.  This wrapper
    fails FAST on the driver with the same diagnosis instead of a
    mid-query stack, and the skip-marked test in
    tests/test_streaming.py keeps the migration cliff visible."""
    if not _protobuf_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package inside "
            "the Python workers (query start fails with "
            "STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / "
            "ModuleNotFoundError: No module named 'google'). It is not "
            "installed in this container; use running_totals_stream "
            "(applyInPandasWithState) — identical semantics."
        )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


DEBOUNCE_OUTPUT_SCHEMA = (
    "user_id long, event_type string, event_id long, ts timestamp"
)
#: island state: the last event time seen for this (user, type) key
DEBOUNCE_STATE_SCHEMA = "last long"


def _debounce_fn(window_seconds: int):
    win_us = window_seconds * 1_000_000

    def fn(key, pdf_iter, state):
        user_id, event_type = key
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        ids = rows["event_id"].astype("int64")
        last = state.get[0] if state.exists else None
        out_ids, out_ts = [], []
        for t, eid in zip(ts_us.tolist(), ids.tolist()):
            if last is None or t - last > win_us:
                out_ids.append(eid)
                out_ts.append(t)
            # every event extends the island, emitted or suppressed —
            # the batch operator's gaps-and-islands rule
            last = t
        state.update((last,))
        if out_ids:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ids),
                    "event_type": [event_type] * len(out_ids),
                    "event_id": out_ids,
                    "ts": [pd.Timestamp(t, unit="us") for t in out_ts],
                }
            )

    return fn


def debounce_stream(
    events_stream: DataFrame,
    window_seconds: int = 60,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming debounce — the live-tail twin of
    ``operators/events_analytics.event_dedup``: per (user, type), emit
    only the FIRST event of each burst island; any event within
    ``window_seconds`` of the previous one (emitted or not) is
    suppressed and extends the island.

    State is ONE timestamp per active (user, type) key — fixed-size, the
    smallest possible stateful footprint; survivors match the batch
    operator's islands exactly when events arrive in event-time order
    (pinned in pytest — out-of-order arrivals within the watermark are
    re-sorted inside each micro-batch; cross-batch disorder is the
    documented residual difference, the same caveat every
    streaming/batch twin in this engine carries)."""
    from p2_mapreduce_spark.streaming.events import as_event_time

    return (
        as_event_time(events_stream)
        .withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _debounce_fn(window_seconds),
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FIRST_SEEN_OUTPUT_SCHEMA = "user_id long, first_ts timestamp"
#: single long: the first observed event-time in microseconds
FIRST_SEEN_STATE_SCHEMA = "seen long"


def _first_seen_fn(
    key, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        # already announced — drain the iterator, emit nothing
        for _ in pdf_iter:
            pass
        return
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    first = int(ts_us.min())
    state.update((first,))
    yield pd.DataFrame(
        {"user_id": [user_id], "first_ts": [pd.Timestamp(first, unit="us")]}
    )


def first_seen_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming new-user detection: emit ``(user_id, first_ts)`` exactly
    ONCE per user — the live tail of growth accounting
    (:func:`p2_mapreduce_spark.operators.events_analytics.
    daily_new_returning` is the batch backfill).

    State is ONE long per user (the announced first event time): the
    minimal possible streaming-distinct state, keyed and shuffled once
    on user_id; every later batch of a known user drains without
    emitting.  Semantics are first-OBSERVED-arrival: an event-time
    straggler arriving after its user was announced does not re-emit
    (exactly-once announcement is the contract; event-time-true first
    timestamps are the batch twin's job on replay).
    """
    from p2_mapreduce_spark.streaming.events import as_event_time

    return (
        as_event_time(events_stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_OUTPUT_SCHEMA,
            stateStructType=FIRST_SEEN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PATTERN_OUTPUT_SCHEMA = "user_id long, seq_len long, n_matches long"
#: the full (ts, event_id, letter) history per user, kept SORTABLE so
#: out-of-order arrivals across micro-batches cannot corrupt the sequence
PATTERN_STATE_SCHEMA = "ts array<long>, ids array<long>, chs string"

_PATTERN_LETTERS = {
    "click": "c", "error": "e", "purchase": "p", "signup": "s", "view": "v",
}


def _pattern_fn(pattern: str):
    import re

    rx = re.compile(pattern)

    def fn(
        key: Tuple[Any, ...],
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        # drop event types outside the letter alphabet BEFORE building the
        # state tuples: an unknown type would get letter "" — invisible in
        # ``seq`` but still occupying a (ts, id) slot, so the persisted
        # chs string would be SHORTER than ts/ids and the next batch's
        # zip(ts0, ids0, chs0) would truncate and misalign letters
        # against events (state corruption, not just a skipped row)
        rows = rows[rows["event_type"].isin(_PATTERN_LETTERS)].reset_index(
            drop=True
        )
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        new = list(
            zip(
                ts_us.tolist(),
                rows["event_id"].astype("int64").tolist(),
                (_PATTERN_LETTERS[t] for t in rows["event_type"]),
            )
        )
        if state.exists:
            ts0, ids0, chs0 = state.get
            merged = sorted(list(zip(ts0, ids0, chs0)) + new)
        else:
            merged = sorted(new)
        seq = "".join(ch for _, _, ch in merged)
        state.update((
            [t for t, _, _ in merged],
            [i for _, i, _ in merged],
            seq,
        ))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "seq_len": [len(seq)],
                "n_matches": [len(rx.findall(seq))],
            }
        )

    return fn


def pattern_match_stream(
    events_stream: DataFrame, pattern: str = "vc*p"
) -> DataFrame:
    """Streaming row-pattern matching (the Flink-CEP workload): the live
    twin of :func:`p2_mapreduce_spark.operators.events_analytics.
    seq_pattern` — per micro-batch, each touched user re-emits
    ``(seq_len, n_matches)`` over their full letter sequence (update
    mode changelog; the LAST emission per user equals the batch
    operator exactly).

    State keeps the per-user ``(ts, event_id, letter)`` history and
    RE-SORTS on every merge, so the count is invariant to how events
    split across micro-batches AND to out-of-order arrival — pinned in
    pytest by replaying shuffled splits.  Python ``re`` and Java regex
    agree on leftmost-non-overlapping ``findall`` counts for the
    patterns this engine ships (no backrefs, no lookaround).

    State is bounded by the busiest single user's event count — the
    same per-key contract as the batch operator and the reference's M5
    reduce; a production deployment sessionizes first (the documented
    seq_pattern composition) so the history is gap-bounded.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _pattern_fn(pattern),
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SPRT_OUTPUT_SCHEMA = (
    "monitor string, n_cum long, k_cum long, llr double, state string"
)
#: (trials, successes, decided: '' | 'accept_h0' | 'accept_h1')
SPRT_STATE_SCHEMA = "n long, k long, decided string"


def _sprt_fn(success_type: str):
    from p2_mapreduce_spark.operators.events_analytics import _sprt_consts

    l1, l0, a, b = _sprt_consts()

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (monitor,) = key
        n, k, decided = state.get if state.exists else (0, 0, "")
        for pdf in pdfs:
            n += int(len(pdf))
            k += int((pdf["event_type"] == success_type).sum())
        llr = k * l1 + (n - k) * l0
        # sticky decision: once a boundary is crossed the monitor stays
        # decided (the sequential test's stopping rule) — later batches
        # keep reporting the decision with the running counts
        if not decided:
            if llr >= a:
                decided = "accept_h1"
            elif llr <= b:
                decided = "accept_h0"
        state.update((n, k, decided))
        yield pd.DataFrame(
            {
                "monitor": [monitor],
                "n_cum": [n],
                "k_cum": [k],
                "llr": [llr],
                "state": [decided or "continue"],
            }
        )

    return fn


def sprt_stream(
    events_stream: DataFrame, success_type: str = "purchase"
) -> DataFrame:
    """Streaming Wald SPRT conversion monitor — the live face of
    :func:`p2_mapreduce_spark.operators.events_analytics.sprt_daily`:
    one state row (trials, successes, decision) under a constant key,
    updated per micro-batch, emitting the running LLR and the STICKY
    decision the moment a boundary is crossed.  The four ln constants
    are the same Python doubles the batch operator and its SQL oracle
    ship, so at any prefix the emitted llr equals the batch
    recomputation bit-for-bit (pinned in pytest).

    State is ONE fixed-size row total (the monitor key is constant) —
    the cheapest possible stateful operator; at scale the interesting
    part is upstream partial aggregation of each micro-batch, which
    Spark does before the single-key state update.
    """
    keyed = events_stream.select(
        F.lit("conversion").alias("monitor"), "event_type"
    )
    return keyed.groupBy("monitor").applyInPandasWithState(
        _sprt_fn(success_type),
        outputStructType=SPRT_OUTPUT_SCHEMA,
        stateStructType=SPRT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


OBV_OUTPUT_SCHEMA = "event_type string, n_days long, last_day string, obv long"
#: per-group day ledger: epoch-day ordinals + their cent/volume totals
LEDGER_STATE_SCHEMA = "xs array<long>, ys array<long>, vs array<long>"
OBV_STATE_SCHEMA = LEDGER_STATE_SCHEMA  # back-compat alias
DRAWDOWN_OUTPUT_SCHEMA = (
    "event_type string, n_days long, peak_cents long, dd_cents long,"
    " dd_frac double"
)


def _day_ledger_fn(fold):
    """Shared stateful kernel of the calendar-ledger monitor family:
    per group, merge each micro-batch's (epoch day, cents) rows into a
    day → (cent total, volume) ledger held in state — a COMMUTATIVE
    merge, so every derived monitor is micro-batch-order-independent
    and replay-idempotent — then emit ``fold(sorted days, ledger)``
    recomputed over the closed ledger.  State is day-grain per group
    (bounded by the observation window), never event-grain."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (g,) = key
        if state.exists:
            xs0, ys0, vs0 = state.get
            acc = {int(x): [int(y), int(v)] for x, y, v in zip(xs0, ys0, vs0)}
        else:
            acc = {}
        for pdf in pdfs:
            for x, c in zip(pdf["x"], pdf["cents"]):
                e = acc.setdefault(int(x), [0, 0])
                e[0] += int(c)
                e[1] += 1
        xs = sorted(acc)
        state.update(
            (xs, [acc[x][0] for x in xs], [acc[x][1] for x in xs])
        )
        out = fold(xs, acc)
        yield pd.DataFrame(
            {"event_type": [g], **{k: [v] for k, v in out.items()}}
        )

    return fn


def _obv_fold(xs, acc):
    import datetime as _dt

    obv, prev_x, prev_y = 0, None, None
    for x in xs:
        y, v = acc[x]
        s = 0
        if prev_x is not None and prev_x == x - 1:
            s = 1 if y > prev_y else (-1 if y < prev_y else 0)
        obv += s * v
        prev_x, prev_y = x, y
    last = (
        (_dt.date(1970, 1, 1) + _dt.timedelta(days=xs[-1])).isoformat()
        if xs
        else ""
    )
    return {"n_days": len(xs), "last_day": last, "obv": obv}


def _drawdown_fold(xs, acc):
    peak, ddc, ddf = 0, 0, 0.0
    for x in xs:
        y = acc[x][0]
        peak = max(peak, y)
        ddc = max(ddc, peak - y)
        if peak > 0:
            ddf = max(ddf, (peak - y) / peak)
    return {
        "n_days": len(xs),
        "peak_cents": peak,
        "dd_cents": ddc,
        "dd_frac": ddf,
    }


def obv_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming on-balance volume — the live face of
    :func:`p2_mapreduce_spark.operators.timeseries.obv_daily`: per
    group, a DAY LEDGER (epoch day → exact cent/volume totals) held in
    state and the OBV recomputed over the closed ledger each
    micro-batch with obv_daily's exact integer rules (a day only
    contributes when its CONSECUTIVE predecessor is observed).

    The state merge is COMMUTATIVE (per-day integer totals), so the
    emitted value is independent of micro-batch arrival order and
    replay-idempotent — after any set of batches the emitted obv
    equals the batch operator on the union of the data, bit for bit
    (pinned in tests/test_streaming.py).  State is day-grain per
    group: bounded by the observation window in days, never by event
    volume — the same calendar-grain contract as the batch op.
    """
    return _ledger_monitor(events_stream, _obv_fold, OBV_OUTPUT_SCHEMA)


def drawdown_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming maximum drawdown — the live face of
    :func:`p2_mapreduce_spark.operators.timeseries.max_drawdown` on
    the same commutative day-ledger state as :func:`obv_stream`: per
    group, the running-peak walk recomputed over the closed ledger
    each micro-batch, emitting (n_days, peak_cents, dd_cents,
    dd_frac) equal to the batch operator on the union of the data,
    bit for bit (pinned in tests/test_streaming.py)."""
    return _ledger_monitor(
        events_stream, _drawdown_fold, DRAWDOWN_OUTPUT_SCHEMA
    )


def _ledger_monitor(events_stream: DataFrame, fold, out_schema: str) -> DataFrame:
    keyed = events_stream.select(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _day_ledger_fn(fold),
        outputStructType=out_schema,
        stateStructType=LEDGER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CROSSOVER_OUTPUT_SCHEMA = (
    "event_type string, n_days long, n_signals long,"
    " last_signal_day string, last_direction string"
)


def _crossover_fold(fast=5, slow=20):
    def fold(xs, acc):
        import datetime as _dt

        by_x = {x: acc[x][0] for x in xs}
        state = {}
        signals = []
        for x in xs:
            wf = [by_x[i] for i in range(x - fast + 1, x + 1) if i in by_x]
            ws = [by_x[i] for i in range(x - slow + 1, x + 1) if i in by_x]
            if len(wf) == fast and len(ws) == slow:
                above = int(sum(wf) * slow > sum(ws) * fast)
                if x - 1 in state and state[x - 1] != above:
                    signals.append((x, "golden" if above else "death"))
                state[x] = above
        last_x, last_dir = (signals[-1] if signals else (None, ""))
        last_day = (
            (_dt.date(1970, 1, 1) + _dt.timedelta(days=last_x)).isoformat()
            if last_x is not None
            else ""
        )
        return {
            "n_days": len(xs),
            "n_signals": len(signals),
            "last_signal_day": last_day,
            "last_direction": last_dir,
        }

    return fold


def crossover_stream(
    events_stream: DataFrame, fast: int = 5, slow: int = 20
) -> DataFrame:
    """Streaming SMA-crossover monitor — the live face of
    :func:`p2_mapreduce_spark.operators.timeseries.ma_crossover` on
    the shared commutative day ledger: per micro-batch the full
    integer-exact signal walk (S_f·slow vs S_s·fast, consecutive-day
    gating) is recomputed over the closed ledger, emitting the signal
    COUNT and the latest signal — equal to the batch operator's rows
    on the union of the data (pinned in tests/test_streaming.py)."""
    return _ledger_monitor(
        events_stream, _crossover_fold(fast, slow), CROSSOVER_OUTPUT_SCHEMA
    )
