"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for operators Structured Streaming's built-ins can't
express (SURVEY.md §2.10 preference order: built-in → pandas →
custom-state). Implemented here: a per-user running profile — cumulative
event count, cumulative value, and a high-water mark — maintained across
micro-batches in explicit grouped state, emitting one updated profile row
per user per batch.

Scale notes: state is per-key and O(1) per key (three scalars), the
canonical bounded-state design; the GroupStateTimeout eviction knob is
exposed so idle keys can be dropped at the watermark horizon. Batches
arrive Arrow-encoded (pandas), never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, hi = state.get
    else:
        n, total, hi = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            hi = max(hi, float(pdf["value"].max()))
    state.update((n, total, hi))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [hi],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user profile stream: one updated row per user per
    micro-batch, cumulative across the stream's lifetime."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state keeps timestamps as epoch-microsecond longs: scalar, timezone-proof
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000


def _session_fn(gap_ms: int):
    def close_sessions(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # the watermark passed session_end + gap: no event can extend
            # this session any more — emit it CLOSED and free the state
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.to_datetime(start_us, unit="us")],
                    "session_end": [pd.to_datetime(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        start_us, end_us, n = (
            state.get if state.exists else (None, None, 0)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            us = pdf["ts"].astype("int64") // 1000
            lo, hi = int(us.min()), int(us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += len(pdf)
        if start_us is None:
            return
        state.update((start_us, end_us, n))
        # arm the event-time alarm: fire when watermark > end + gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_ms)

    return close_sessions


def closed_sessions(
    events: DataFrame, gap_ms: int = SESSION_GAP_MS
) -> DataFrame:
    """Custom sessionizer emitting only CLOSED sessions, via event-time
    timeout — the applyInPandasWithState pattern session_window can't
    express (it emits on watermark too, but can't run arbitrary
    per-session logic at close time; this template can score, filter, or
    side-output the session before emitting).

    A session closes when the watermark passes ``last_event + gap``; the
    timeout callback emits exactly one row per session and removes the
    state, so state size tracks *open* sessions only — the bounded-state
    contract that keeps this runnable on an unbounded stream.

    ``events`` must already carry ``withWatermark("ts", ...)`` —
    EventTimeTimeout requires it.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


SCD2_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open run per user: current state string, run start (epoch µs), last seen
# event (µs, event_id tiebreak) and the run's event count
SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_state", T.StringType()),
        T.StructField("from_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _scd2_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming twin of q_scd2_intervals: maintain each user's OPEN
    run in state; every state change closes the previous run and emits
    it as a finished [valid_from, valid_to) interval. The open interval
    is never emitted (it is not final until the stream ends) — exactly
    the rows the batch operator marks is_current=false.

    A large group arrives as SEVERAL Arrow chunks in arbitrary shuffle
    order, so the whole batch's events are concatenated and sorted by
    (ts, event_id) BEFORE folding — sorting each chunk independently
    would fold events out of order across chunk boundaries and emit
    spurious intervals. Within one micro-batch any chunking therefore
    yields the same closed intervals as the batch gaps-and-islands
    query (equivalence pinned in tests/test_stateful_streaming.py)."""
    (user_id,) = key
    if state.exists:
        cur, from_us, last_us, last_eid, n = state.get
    else:
        cur, from_us, last_us, last_eid, n = None, None, None, None, 0
    closed: list[tuple] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        batch = batch.sort_values(["ts", "event_id"])
        for ts, eid, etype in zip(
            batch["ts"].astype("int64") // 1000,
            batch["event_id"],
            batch["event_type"],
        ):
            ts, eid = int(ts), int(eid)
            if cur is None:
                cur, from_us, n = etype, ts, 0
            elif etype != cur:
                closed.append((user_id, cur, from_us, ts, n))
                cur, from_us, n = etype, ts, 0
            n += 1
            last_us, last_eid = ts, eid
    state.update((cur, from_us, last_us, last_eid, n))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "state": [c[1] for c in closed],
                "valid_from": [pd.to_datetime(c[2], unit="us") for c in closed],
                "valid_to": [pd.to_datetime(c[3], unit="us") for c in closed],
                "n_events": [c[4] for c in closed],
            }
        )


def scd2_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD2: closed type-2 intervals per user as they finish.

    PRECONDITION — in-order arrival ACROSS micro-batches: events are
    sorted by (ts, event_id) within each batch, but there is no
    watermark/late-event buffering, so an event arriving in a later
    micro-batch with an earlier timestamp is folded after the runs
    already closed and the output diverges from q_scd2_intervals.
    Equivalence with the batch operator holds for any batch *slicing*
    of an in-order stream, not for out-of-order delivery; feed from a
    time-ordered source (replay log, ordered Kafka partition per user)
    or pre-sort upstream.

    Scale: state is O(1) per user (one open run — five scalars); the
    shuffle key is user_id, same as the batch twin's single Exchange.
    Append-mode output — each closed interval is emitted exactly once.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_fn,
        outputStructType=SCD2_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FILTER_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("reason", T.StringType()),
        T.StructField("keep", T.BooleanType()),
    ]
)

# one flag per distinct content hash: has a doc with this hash passed?
FILTER_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType())])

MIN_DOC_TOKENS = 20
MIN_QUALITY = 0.5


def _corpus_filter_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Grouped by content hash: the FIRST arrival (min doc_id within the
    batch, state across batches) gets the quality ladder; every later
    arrival is 'duplicate'. Same concat-then-sort discipline as
    _scd2_fn — chunk order is not contractual."""
    seen = state.exists
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    batch = (
        pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    ).sort_values("doc_id")
    doc_ids, n_toks, reasons, keeps = [], [], [], []
    for doc_id, n_tokens, quality in zip(
        batch["doc_id"], batch["n_tokens"], batch["quality"]
    ):
        if seen:
            reason = "duplicate"
        else:
            seen = True
            if n_tokens < MIN_DOC_TOKENS:
                reason = "too_short"
            elif quality < MIN_QUALITY:
                reason = "low_quality"
            else:
                reason = "ok"
        doc_ids.append(int(doc_id))
        n_toks.append(int(n_tokens))
        reasons.append(reason)
        keeps.append(reason == "ok")
    state.update((1,))
    yield pd.DataFrame(
        {
            "doc_id": doc_ids,
            "n_tokens": n_toks,
            "reason": reasons,
            "keep": keeps,
        }
    )


def corpus_filter_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of q_corpus_filter (operators/textops.py): every
    arriving document gets its keep/drop decision with the same
    first-failing-rule ladder; 'duplicate' means a document with the
    same content hash already passed through the stream — exactly the
    batch operator's min-doc_id keeper rule when arrival order follows
    doc_id (equivalence pinned in tests/test_stateful_streaming.py).

    The stateless signals (hash, token count, quality score) are
    computed in a codegen projection BEFORE the stateful stage; the
    applyInPandasWithState op only carries the cross-batch duplicate
    memory — one long per distinct content hash. Production streams
    should bound that state with an event-time TTL (the
    GroupStateTimeout knob, as in closed_sessions) at the horizon where
    re-emitting an old duplicate is acceptable.

    ``docs`` must carry (doc_id, text); signals are derived here.
    """
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.functions.text import (
        tokens,
    )

    tok = tokens(F.col("text"))
    sw = ("the", "a", "of", "and")
    n_tok = F.size(tok).cast("bigint")
    sw_hits = F.size(F.filter(tok, lambda x: x.isin(*sw))).cast("bigint")
    sig = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        n_tok.alias("n_tokens"),
        (
            F.least(n_tok / 50.0, F.lit(1.0)) * 0.6
            + F.least(sw_hits / (n_tok + 1.0) * 5.0, F.lit(1.0)) * 0.4
        ).alias("quality"),
    )
    return sig.groupBy("h").applyInPandasWithState(
        _corpus_filter_fn,
        outputStructType=FILTER_OUT_SCHEMA,
        stateStructType=FILTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LINEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("line_idx", T.LongType()),
        T.StructField("line", T.StringType()),
        T.StructField("keep", T.BooleanType()),
    ]
)
LINEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType())])


def _dedup_lines_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Grouped by line hash: the first arrival (min (doc_id, line_idx)
    within the batch, flag-state across batches) keeps its line; every
    later occurrence anywhere in the stream is dropped. Concat-then-sort
    — Arrow chunk order is not contractual."""
    seen = state.exists
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    batch = (
        pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    ).sort_values(["doc_id", "line_idx"])
    keeps = []
    for _ in range(len(batch)):
        keeps.append(not seen)
        seen = True
    state.update((1,))
    yield pd.DataFrame(
        {
            "doc_id": batch["doc_id"].astype("int64"),
            "line_idx": batch["line_idx"].astype("int64"),
            "line": batch["line"],
            "keep": keeps,
        }
    )


def dedup_lines_stream(docs: DataFrame, k: int = 4) -> DataFrame:
    """Streaming twin of q_dedup_lines (operators/linedup.py): every
    arriving document is segmented into k-token lines in a stateless
    codegen projection (the same zero-shuffle Generate-barrier chunk
    build as the batch operator), then an applyInPandasWithState stage
    keyed on the line hash keeps only the FIRST corpus occurrence of
    each distinct line — across micro-batches. When arrival order
    follows doc_id, the kept set equals the batch operator's
    min-(doc_id, line_idx) keeper rule (equivalence pinned in
    tests/test_stateful_streaming.py, duplicates split across batches).

    State is one long per distinct line hash — the same unbounded-
    vocabulary caveat as corpus_filter_stream: production streams bound
    it with an event-time TTL at the horizon where re-admitting an old
    boilerplate line is acceptable.

    ``docs`` must carry (doc_id, text). Output is per-line (update
    mode); consumers reassemble documents downstream exactly like the
    batch operator's final groupBy(doc_id) sorted concat.
    """
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators.linedup import (
        _chunk_lines,
    )

    lines = _chunk_lines(docs, k).withColumn("h", F.md5("line"))
    return lines.groupBy("h").applyInPandasWithState(
        _dedup_lines_fn,
        outputStructType=LINEDUP_OUT_SCHEMA,
        stateStructType=LINEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEBOUNCE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
# last KEPT event's timestamp (µs since epoch) per (user, type)
DEBOUNCE_STATE_SCHEMA = T.StructType([T.StructField("last_kept_us", T.LongType())])


def _debounce_fn(gap_us: int):
    def debounce(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Keyed by (user_id, event_type): keep an event iff it is more
        than ``gap_us`` after the last KEPT event — the sequential fold
        the batch q_debounce deliberately does NOT implement (its
        predecessor-gap lag window is SQL-expressible; this recurrence
        is not, because each keep decision depends on the previous keep
        decision, not the previous row). Same concat-then-sort
        discipline as _scd2_fn — Arrow chunk order is not contractual.
        """
        user_id, event_type = key
        last = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values(["ts", "event_id"])
        kept: list[tuple[int, int]] = []
        for ts, eid in zip(
            batch["ts"].astype("int64") // 1000, batch["event_id"]
        ):
            ts, eid = int(ts), int(eid)
            if last is None or ts - last > gap_us:
                kept.append((eid, ts))
                last = ts
        if last is not None:
            state.update((last,))
        if kept:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(kept),
                    "event_type": [event_type] * len(kept),
                    "event_id": [k[0] for k in kept],
                    "ts": [pd.to_datetime(k[1], unit="us") for k in kept],
                }
            )

    return debounce


def debounce_stream(
    events: DataFrame, gap_seconds: int = 60
) -> DataFrame:
    """Streaming debounce with keep-after-last-KEPT semantics: an event
    is kept iff it arrives more than ``gap_seconds`` after the last
    event that was KEPT for the same (user_id, event_type) — a burst of
    rapid events collapses into its FIRST member no matter how long the
    burst lasts, unlike the batch q_debounce's predecessor-gap window,
    where a chain of sub-gap events keeps none after the first but
    RESETS its clock on every arrival. The recurrence (each decision
    feeds the next) is exactly the sequential fold the batch docstring
    scopes to the streaming path.

    PRECONDITION — in-order arrival across micro-batches, same as
    scd2_stream: events sort by (ts, event_id) within a batch, but an
    event arriving late in a later batch is judged against state that
    already advanced past it.

    Scale: state is ONE long per (user, type) — O(active key space),
    not O(events); the shuffle key matches the batch twin's window
    partitioning. Append mode: each kept event emits exactly once.
    """
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_fn(gap_seconds * 1_000_000),
        outputStructType=DEBOUNCE_OUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RESERVOIR_K = 10

RESERVOIR_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("weight", T.LongType()),
        T.StructField("sample_key", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)
# the k smallest race keys seen so far, as parallel arrays, plus a
# monotonically increasing version stamped on every emission
RESERVOIR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.DoubleType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("weights", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)


def _reservoir_fn(k: int):
    def fold(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Keyed by source: merge this batch's pre-computed race keys
        into the k-smallest reservoir. The merge is a plain sort of
        (stored ∪ batch) — order-insensitive, so Arrow chunk order and
        micro-batch slicing cannot change the result (A-ES reservoirs
        are mergeable: min-k(A ∪ B) == min-k(min-k(A) ∪ min-k(B)))."""
        (source,) = key
        if state.exists:
            keys, ids, weights, version = state.get
            pool = list(zip(keys, ids, weights))
        else:
            pool, version = [], 0
        for pdf in pdfs:
            pool.extend(
                zip(
                    pdf["sample_key"].astype("float64"),
                    pdf["doc_id"].astype("int64"),
                    pdf["weight"].astype("int64"),
                )
            )
        pool = [(float(sk), int(i), int(w)) for sk, i, w in pool]
        pool.sort(key=lambda t: (t[0], t[1]))
        pool = pool[:k]
        version += 1
        state.update(
            (
                [t[0] for t in pool],
                [t[1] for t in pool],
                [t[2] for t in pool],
                version,
            )
        )
        yield pd.DataFrame(
            {
                "source": [source] * len(pool),
                "doc_id": [t[1] for t in pool],
                "weight": [t[2] for t in pool],
                "sample_key": [t[0] for t in pool],
                "version": [version] * len(pool),
            }
        )

    return fold


def weighted_reservoir_stream(
    docs: DataFrame, k: int = RESERVOIR_K
) -> DataFrame:
    """Per-source weighted reservoir sampling WITHOUT replacement over
    a document stream — the streaming form of q_weighted_sample, and
    the setting Efraimidis–Spirakis 2006 was designed for: each
    arriving document draws its deterministic race key -ln(u)/weight
    (u from the doc_id's md5, weight = n_chars — the IDENTICAL
    expression text as the batch query, computed in the stateless
    projection so the stateful fold is arithmetic-free), and the state
    keeps the k smallest keys per source. At any instant the reservoir
    IS a weighted sample without replacement of everything seen.

    Exactly-mergeable, so NO arrival-order precondition (unlike
    scd2/debounce): min-k is associative and commutative over batches
    and chunks — any slicing yields the reservoir batch A-ES would
    pick on the union (equivalence pinned in tests, including the
    deterministic tie-break on (key, doc_id)).

    Scale: state is O(k) per source; emission tags a per-source
    ``version`` so downstream consumers (and tests) can select each
    source's latest reservoir from an update-mode sink. The shuffle
    key is ``source`` — the same per-source mixing quota the batch
    curation path uses (q_source_weights / q_weighted_sample).

    ``docs`` must carry (doc_id, source, n_chars).
    """
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators.dataset import (
        _wsample_key_sql,
    )

    key_expr = F.expr(_wsample_key_sql().replace("VARCHAR", "STRING"))
    scored = docs.filter(F.col("n_chars") > 0).select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        key_expr.alias("sample_key"),
    )
    return scored.groupBy("source").applyInPandasWithState(
        _reservoir_fn(k),
        outputStructType=RESERVOIR_OUT_SCHEMA,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_kmin", T.LongType()),
        T.StructField("kth", T.LongType()),
        T.StructField("est_distinct", T.DoubleType()),
    ]
)

KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("kmin", T.ArrayType(T.LongType()))]
)

_KMV_STREAM_K = 64


def _update_kmv(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    k = _KMV_STREAM_K
    kmin: list[int] = list(state.get[0]) if state.exists else []
    # vectorized merge: per-batch unique (numpy) unioned into the O(k)
    # carried set — never a per-row Python loop
    have = set(kmin)
    for pdf in pdfs:
        have.update(int(v) for v in pdf["hv"].unique())
    kmin = sorted(have)[:k]
    state.update((kmin,))
    m = len(kmin)
    kth = kmin[-1] if kmin else 0
    est = float(m) if m < k else (k - 1) * 4294967296.0 / kth
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n_kmin": [m],
            "kth": [kth],
            "est_distinct": [round(est, 1)],
        }
    )


def kmv_sketch_stream(events: DataFrame) -> DataFrame:
    """Streaming KMV sketch maintenance — the §2.9 lift of the
    q_kmv_distinct/q_kmv_merge family: per event_type, the k smallest
    distinct md5 hashes of user_id are carried as explicit grouped
    state (O(k) longs per key — the same mergeable sketch array
    q_kmv_merge materializes per shard), updated every micro-batch, and
    the current distinct-count estimate is emitted per batch. A
    dashboard reading this stream gets a continuously-fresh cardinality
    at O(k) state per group, where exact streaming distinct would hold
    every key ever seen.

    The hash projection runs codegen-side BEFORE the stateful stage
    (same split as corpus_filter_stream); the pandas fn only merges
    sorted O(k) arrays. Merge order is irrelevant (set-union + k-min is
    associative/commutative — the q_kmv_merge losslessness argument),
    so the estimate equals the batch sketch over the same rows
    (equivalence pinned in tests).
    """
    from pyspark.sql import functions as F

    hv = events.select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), "
            "16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    return hv.groupBy("event_type").applyInPandasWithState(
        _update_kmv,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Time-decayed engagement (streaming twin of operators/funnel.py's
# q_decayed_engagement — same 7-day half-life; a test pins the constants
# equal).

DECAY_HALF_LIFE_DAYS = 7.0
_US_PER_DAY = 86400000000.0

DECAY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("asof_us", T.LongType()),
        T.StructField("decayed_score", T.DoubleType()),
    ]
)

DECAY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("asof_us", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _decay_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    import numpy as np

    (user_id,) = key
    lam = math.log(2.0) / DECAY_HALF_LIFE_DAYS
    if state.exists:
        n, asof, score = state.get
    else:
        n, asof, score = 0, None, 0.0
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("tus")
        t = pdf["tus"].to_numpy(dtype=np.int64)
        v = pdf["value"].to_numpy(dtype=np.float64)
        t_new = int(t[-1])
        # One vectorized pass per Arrow batch: the kernel is
        # score(t_new) = carry·e^(-λΔ) + Σ v_i·e^(-λ(t_new - t_i)),
        # exact for ANY event order (the exponential telescopes), so
        # late/out-of-order arrivals need no reordering of state.
        w = np.exp(-lam * (t_new - t) / _US_PER_DAY)
        batch_sum = float(np.dot(v, w))
        if asof is None:
            score = batch_sum
        else:
            score = score * math.exp(-lam * (t_new - asof) / _US_PER_DAY)
            score += batch_sum
        asof = t_new
        n += len(pdf)
    state.update((n, asof if asof is not None else 0, score))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "asof_us": [asof if asof is not None else 0],
            "decayed_score": [score],
        }
    )


def decayed_engagement_stream(events: DataFrame) -> DataFrame:
    """Per-user exponentially time-decayed engagement score maintained
    incrementally: state is THREE scalars per user (count, last event
    time, score-as-of-last-event) — the online form of the batch
    fixed-reference query. Reading the score at any time T is one
    multiply: score·2^(-(T - asof)/half_life).

    The recursive update is mathematically exact under ANY arrival
    order (the exponential kernel telescopes), so no watermark/reorder
    buffer is needed for correctness — only for state eviction, which
    GroupStateTimeout would provide in production.

    Scale: O(1) state per user, one vectorized numpy pass per Arrow
    batch; same bounded-state posture as user_profiles.
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", F.unix_micros("ts").alias("tus"), "value"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _decay_fn,
        outputStructType=DECAY_SCHEMA,
        stateStructType=DECAY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTRIB_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("attributed_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ATTRIB_STATE_SCHEMA = T.StructType(
    [T.StructField("last_touch", T.StringType())]
)


def _attrib_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_touch = state.get[0] if state.exists else None
    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples(index=False):
            if r.event_type == "purchase":
                out.append(
                    (
                        user_id,
                        int(r.event_id),
                        r.ts,
                        last_touch or "direct",
                        float(r.value),
                    )
                )
            else:
                last_touch = r.event_type
    state.update((last_touch,))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "event_id", "ts", "attributed_type", "value",
            ],
        )


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of q_attribution (funnel.py): one attributed row
    per PURCHASE as it lands, crediting the user's most recent
    preceding non-purchase touch — O(1) state per user (just the last
    touch type), the canonical "enrich the conversion at arrival time"
    shape that batch last-touch reports recompute nightly.

    Equivalence contract (pinned in tests/test_attribution_stream.py):
    identical to the batch window when events arrive in (ts, event_id)
    order — rows are sorted within each micro-batch, and cross-batch
    order holds when the producer drops files in order (the debounce
    op's same in-order slicing assumption). A late purchase attributes
    to the state at PROCESSING time — the documented streaming
    approximation; bound it with a watermark-driven reorder buffer
    upstream if exact late-data semantics are required.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _attrib_fn,
        outputStructType=ATTRIB_SCHEMA,
        stateStructType=ATTRIB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
