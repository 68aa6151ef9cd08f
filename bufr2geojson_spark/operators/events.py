"""Event-stream relational operators: sessionization and as-of join.

Two classic temporal operators the reference's relational surface (§2.3)
lacks but any at-scale event pipeline needs. Both are single-window
formulations: one shuffle keyed on the entity (user), then a sorted pass —
the shape that scales to 100 TB because per-user event lists are small and
the sort is within the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap``. Returns one row per
    (user, session): ordinal session_id (1-based per user), event count,
    start/end timestamps, summed value.

    Plan: ONE shuffle (partitionBy user), lag + running sum of
    session-start flags inside the sorted window, then a groupBy that
    reuses the same partitioning (no second exchange of note). The
    equivalent Structured Streaming shape is a session window with
    watermark; this is the batch form."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    flagged = events.withColumn(
        "_new",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (F.col(ts_col) > F.lag(ts_col).over(w) + gap_expr),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (
        flagged.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(F.sum(value_col), 2).alias("session_value"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("ts", "event_id", "value"),
) -> DataFrame:
    """AS-OF join: for every left row, attach the most recent right row of
    the same key with ``right.ts <= left.ts`` (inclusive). Nearest-past
    semantics — DuckDB's native ``ASOF JOIN`` is the oracle.

    Distributed shape: the UNION-TAG algorithm, not a range join — tag both
    sides, union, one shuffle keyed on ``on``, one sorted pass carrying the
    last-seen right row forward (``last(..., ignorenulls=True)``). A naive
    range join explodes to O(left × right-per-key) candidate pairs; this is
    O(left + right) rows through one exchange, the standard at-scale as-of
    plan (same-timestamp ties order the right row first, so 'inclusive'
    holds)."""
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
    )
    tagged_r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c != on and c != ts_col else F.col(c)
          for c in lcols],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows sort BEFORE left rows at an equal timestamp → inclusive <=
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *lcols, *[f"asof_{c}" for c in right_cols]
    )


def interval_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join (``start <= ts < end``) WITHOUT the cartesian
    a naive theta-join plans: both sides are keyed to fixed time buckets —
    each event to the one bucket containing its timestamp, each interval
    EXPLODED to the buckets it overlaps — so the join is a plain equi-join
    on the bucket id, then an exact containment filter. Shuffle and work
    are O(events + Σ interval-buckets), never |events| × |intervals|; an
    event's single bucket means a qualifying (event, interval) pair is
    produced exactly once, so no post-join dedup. Skewed buckets re-split
    under AQE; ``bucket_seconds`` trades interval fan-out (long intervals
    → more bucket copies) against bucket width (wider → more false
    candidates filtered after the join).

    Returns every event column plus the matching interval's columns; events
    matching no interval are dropped (inner semantics), events in several
    overlapping intervals appear once per match.
    """
    bus = F.lit(int(bucket_seconds) * 1_000_000)

    # works for TIMESTAMP and TIMESTAMP_NTZ columns alike: the NTZ->TZ cast
    # uses the session timezone, but it is applied identically to events and
    # intervals, so bucket alignment is timezone-independent
    def ep(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp"))

    e = events.withColumn(
        "_bucket", F.floor(ep(F.col(ts_col)) / bus)
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(ep(F.col(start_col)) / bus),
                # end is exclusive: the last covered microsecond is end-1
                F.floor((ep(F.col(end_col)) - 1) / bus),
            )
        ),
    )
    return (
        e.join(i, "_bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bucket")
    )


def throttle_events(
    events: DataFrame,
    cooldown_s: int = 43200,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Chained-cooldown dedup (alert throttling / retransmission
    suppression): per key, keep the first event, then suppress every event
    closer than ``cooldown_s`` to the last KEPT event. This is NOT
    gap-sessionization — suppression is measured from the last kept event,
    not the previous event — so a steady drizzle of sub-cooldown events
    still emits one kept event per cooldown period instead of collapsing
    into one endless session. The chain makes each row's fate depend on a
    sequential scan, which no window/lag composition expresses; it is the
    canonical per-key custom stateful operator.

    Distributed shape: one shuffle keyed on ``key_col``; each group is a
    single ordered pass with O(1) state (the last kept timestamp) — the
    batch twin of an ``applyInPandasWithState`` streaming throttle. Ties
    on the timestamp break by ``seq_col`` so results are deterministic
    under any partitioning.
    """
    import numpy as np

    cd = np.timedelta64(int(cooldown_s), "s")

    def f(pdf):
        pdf = pdf.sort_values([ts_col, seq_col])
        ts = pdf[ts_col].to_numpy()
        keep = np.zeros(len(pdf), dtype=bool)
        last = None
        for i in range(len(ts)):
            if last is None or ts[i] >= last + cd:
                keep[i] = True
                last = ts[i]
        return pdf[keep]

    return events.groupBy(key_col).applyInPandas(f, schema=events.schema)


def resample_interpolate(
    events: DataFrame,
    step: str = "6 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Resample each key's irregular series onto a regular ``step`` grid
    with linear interpolation (the gap-filling primitive for observation
    series — station pressure every 6 h from whenever bulletins arrived).

    Grid: per key, from the key's first observation rounded down to a
    ``step`` boundary (epoch-aligned) through its last observation. Each
    grid instant takes the linear interpolation between the nearest
    observation at-or-before and at-or-after; a grid point that coincides
    with an observation returns that value exactly (both neighbors equal).

    Distributed shape: the union-tag pattern of ``asof_join`` doubled — one
    shuffle keyed on the entity, one sorted window pass carrying the
    previous observation forward and (reversed frame) the next observation
    backward; grid rows are generated with ``F.sequence``/``explode`` from
    a per-key min/max aggregate, never on the driver. O(grid + events)
    rows through one exchange."""
    step_expr = F.expr(f"INTERVAL {step}")
    # step length in seconds, timezone-free: epoch + interval, read back as
    # unix seconds (a string→timestamp cast here would shift with the
    # session timezone — the ingest.py round-1 lesson)
    step_sec = F.unix_timestamp(F.timestamp_seconds(F.lit(0)) + step_expr)
    bounds = events.groupBy(key_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    grid_start = F.timestamp_seconds(
        F.floor(F.unix_timestamp("_t0") / step_sec) * step_sec
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(grid_start, F.col("_t1"), step_expr)
        ).alias(ts_col),
    )
    obs = events.select(
        key_col,
        F.col(ts_col),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_is_grid"),
    )
    g = grid.select(
        key_col, ts_col,
        F.lit(None).cast("double").alias("_v"),
        F.lit(1).alias("_is_grid"),
    )
    unioned = obs.unionByName(g)
    # observations sort before grid rows at the same instant → an exactly
    # coincident observation is its own prev AND next neighbor
    order = [F.col(ts_col).asc(), F.col("_is_grid").asc()]
    wprev = (
        Window.partitionBy(key_col).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).desc(), F.col("_is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        unioned
        .withColumn("_pv", F.last("_v", ignorenulls=True).over(wprev))
        # neighbor timestamps must track the same rows as the neighbor
        # VALUES: a null-valued observation contributes neither, or _pt/_pv
        # would come from different rows and skew the interpolation weight
        .withColumn("_pt", F.last(
            F.when(F.col("_v").isNotNull(), F.col(ts_col)),
            ignorenulls=True).over(wprev))
        .withColumn("_nv", F.last("_v", ignorenulls=True).over(wnext))
        .withColumn("_nt", F.last(
            F.when(F.col("_v").isNotNull(), F.col(ts_col)),
            ignorenulls=True).over(wnext))
    )
    # fractional epoch seconds (timestamp→double keeps microseconds;
    # unix_timestamp would truncate and diverge from a SQL oracle's epoch())
    pt = F.col("_pt").cast("double")
    nt = F.col("_nt").cast("double")
    t = F.col(ts_col).cast("double")
    interp = (
        F.when(F.col("_pt").isNull(), F.col("_nv"))   # before first obs
        .when(F.col("_nt").isNull(), F.col("_pv"))    # after last obs
        .when(F.col("_pt") == F.col("_nt"), F.col("_pv"))  # exact hit
        .otherwise(
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv")) * (t - pt) / (nt - pt)
        )
    )
    return (
        carried.filter(F.col("_is_grid") == 1)
        .select(
            key_col, ts_col,
            interp.alias("value_interp"),
            F.col("_pt").alias("prev_ts"),
            F.col("_nt").alias("next_ts"),
        )
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: (from_state, to_state, n_transitions, prob_e6) where
    prob_e6 = floor(1e6 * n / Σ_row n) — the row-normalized transition
    probability in integer millionths for cross-engine exactness. The
    standard behavioral-sequence model (next-action prediction, funnel
    generalization).

    Plan: ONE shuffle keyed on the entity (lead over the per-user window,
    ordered by (ts, tie) so equal timestamps are deterministic), then a
    map-side-combinable pair count. The matrix is |states|² rows, so the
    row-total normalization is a window over a tiny aggregate — the heavy
    data passes through exactly one exchange regardless of corpus size.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    pairs = (
        events.withColumn("_next", F.lead(state_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("_next").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wrow = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.floor(
            F.col("n_transitions") * F.lit(1_000_000)
            / F.sum("n_transitions").over(wrow)
        ).cast("long").alias("prob_e6"),
    )


def sequence_ngrams(
    events: DataFrame,
    n: int = 3,
    min_support: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Frequent contiguous event-type n-grams across per-entity
    sequences — the sequence-mining primitive behind "common user
    journeys" (the contiguous special case of PrefixSpan, which is the
    part that scales as a pure DataFrame program).

    Plan: ONE entity-keyed shuffle; n-1 stacked leads inside the same
    sorted window (one WindowExec, not n-1), then a map-side-combinable
    groupBy on the n-gram key. Support filtering happens in the
    aggregate — the output is the (small) pattern vocabulary, never the
    sequence stream. Returns (gram, n_occurrences), gram as
    "a>b>c", ordered ties deterministic via (ts, tie).

    Null and delimiter hygiene: rows with a NULL state are dropped from
    the sequence BEFORE the window (concat_ws would otherwise silently
    skip the null mid-gram and emit a misleading "a>c"), and any '>'
    inside a state value is escaped to '\\>' so the gram string parses
    back unambiguously. Both are identity transforms on well-behaved
    state vocabularies, so SQL oracles over such data are unaffected.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    esc = F.replace(F.col(state_col), F.lit(">"), F.lit("\\>"))
    events = events.filter(F.col(state_col).isNotNull()) \
        .withColumn("_st", esc)
    cols = [F.col("_st")]
    for i in range(1, int(n)):
        cols.append(F.lead("_st", i).over(w))
    out = events.select(F.concat_ws(">", *cols).alias("gram"),
                        cols[-1].isNotNull().alias("_full"))
    return (
        out.filter(F.col("_full"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= int(min_support))
    )
