"""Stream-stream event-time join: purchase attribution to views.

The missing join class in the streaming tier (sync/windowed/stateful/
dedup cover source→sink, window aggs, custom state, re-delivery;
enrich covers stream-STATIC): joining two live streams requires both
sides to buffer state and a watermark + event-time bound to let Spark
expire it — without the time-range conjunct the state grows without
bound and the job dies at scale, which is why ``max_delay`` is part of
the operator signature, not an optional tuning knob.

Reference parity: the reference has no streaming tier (its sync loop is
a 24 h ticker, internal/strava/strava.go:261); this is the Spark-native
generalization of "which sync fetched the activity a webhook later
updated" — correlating two live feeds within a bounded delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attribution_join(
    lead: DataFrame,
    follow: DataFrame,
    how: str,
    max_delay: str,
    watermark: str,
    key: str,
) -> DataFrame:
    """Shared plan for both attribution variants: the projections, the
    key + time-range conjunct, and the output shape must stay identical
    between the inner and left-outer feeds — one spelling here keeps a
    condition fix from silently giving the two feeds different
    semantics."""
    l = (
        lead.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col("ts").alias("lead_ts"),
            F.col("event_id").alias("lead_id"),
            F.col("event_type").alias("lead_type"),
        )
    )
    f = (
        follow.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("f_key"),
            F.col("ts").alias("follow_ts"),
            F.col("event_id").alias("follow_id"),
            F.col("event_type").alias("follow_type"),
            F.col("value").alias("follow_value"),
        )
    )
    cond = (
        (F.col("f_key") == F.col("l_key"))
        & (F.col("lead_ts") <= F.col("follow_ts"))
        & (F.col("lead_ts") >= F.col("follow_ts") - F.expr(f"interval {max_delay}"))
    )
    return f.join(l, cond, how).select(
        F.col("f_key").alias("user_id"),
        "follow_id",
        "follow_type",
        "follow_ts",
        "follow_value",
        "lead_id",
        "lead_type",
        "lead_ts",
    )


def attribute_to_prior_event(
    lead: DataFrame,
    follow: DataFrame,
    *,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    """Join each ``follow`` event to ``lead`` events of the same key
    that happened within ``(follow.ts - max_delay, follow.ts]``.

    Both inputs are streaming frames with ``ts`` event time. Watermarks
    on BOTH sides plus the range conjunct bound the buffered state to
    ``watermark + max_delay`` of history per side; late rows beyond the
    watermark drop (counted by the sink's metrics, not silently
    corrupting attribution). Inner semantics: unattributed follows are
    the anti-side and stay queryable from the raw stream.
    """
    return _attribution_join(lead, follow, "inner", max_delay, watermark, key)


def attribute_with_unmatched(
    lead: DataFrame,
    follow: DataFrame,
    *,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    """LEFT OUTER variant of :func:`attribute_to_prior_event`: follows
    with no qualifying lead still emit, lead columns null — the
    "unattributed conversions" feed a funnel monitor needs as one
    stream instead of a separate anti-join job.

    Outer stream-stream semantics are watermark-driven: an unmatched
    follow row is held in state until the watermark passes
    ``follow_ts + max_delay`` (no earlier — a matching lead could still
    arrive) and only then emits with nulls. That deferred emission is
    inherent to correctness, not a perf bug; the state bound stays
    ``watermark + max_delay`` per side, same as the inner join.
    """
    return _attribution_join(
        lead, follow, "left_outer", max_delay, watermark, key
    )


def _delay_seconds(spec: str) -> int:
    """Parse the 'N unit' interval strings this module accepts into
    whole seconds (the bucket arithmetic needs an integer width)."""
    n, unit = spec.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }.get(unit)
    if mult is None:
        raise ValueError(f"unsupported interval unit in {spec!r}")
    return int(n) * mult


def attribute_to_prior_event_bucketed(
    lead: DataFrame,
    follow: DataFrame,
    *,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    """Hot-key-immune twin of :func:`attribute_to_prior_event` — SAME
    inner-join output, provably row-for-row (tests pin equality):
    the equality key widens from ``key`` to ``(key, time_bucket)``
    with bucket width = ``max_delay``.

    WHY (r10 degree/user skew rehearsal): Spark's symmetric hash join
    buffers state per EQUALITY key and, for every input row, iterates
    ALL buffered same-key rows, filtering the time-range conjunct
    row-by-row — per-key work is quadratic in the hot key's rows. At
    the mult=100 hot-user corpus (25% of 10M events on one user) the
    left-outer audit ground one state partition for 56+ CPU-minutes
    before being killed. Widening the key fragments the hot user's
    state across time buckets, bounding per-row iteration to two
    buckets' worth of that user's rows, and simultaneously spreads
    the state-store partitions.

    Exactness: a qualifying pair has ``lead_ts ∈ [follow_ts - B,
    follow_ts]``, so ``bucket(lead) ∈ {bucket(follow) - 1,
    bucket(follow)}`` (integer-second buckets; the second-truncated
    bucket of ``follow_ts - B`` is exactly ``bucket(follow) - 1``).
    The follow side therefore duplicates into those two bucket slots,
    and each true pair matches EXACTLY the copy whose slot equals the
    lead's bucket — no dedup step exists or is needed. The range
    conjunct stays in full-µs precision; buckets only route.

    Event times must be post-epoch — not a bucket-math caveat but an
    engine fact: Spark seeds the stream watermark at epoch 0, so any
    watermarked stateful operator late-drops pre-1970 rows on arrival.
    The bucket index still uses ``unix_timestamp`` (floorDiv) rather
    than a trunc-toward-zero cast so the floor stays exact for any
    input the engine admits (r10 ADVICE).

    The LEFT-OUTER variant deliberately has no bucketed twin: an
    unmatched follow is a per-key GLOBAL fact (no copy may match),
    which a compound-key join cannot express without a second
    stateful repair stage; the production shape for hot-key corpora
    is this inner join for attribution plus the batch anti-join for
    the unmatched tail (see attribution_audit's rationale note).
    """
    B = _delay_seconds(max_delay)
    l = (
        lead.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col("ts").alias("lead_ts"),
            F.col("event_id").alias("lead_id"),
            F.col("event_type").alias("lead_type"),
            # unix_timestamp floorDivs micros -> seconds, so the bucket
            # index is a TRUE floor for pre-epoch timestamps too; a bare
            # cast('long') truncates toward zero below 1970 and would
            # break the two-slot invariant (a qualifying pair landing
            # outside both follow copies) — r10 ADVICE
            F.floor(F.unix_timestamp(F.col("ts")) / B).alias("l_bkt"),
        )
    )
    f_base = (
        follow.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("f_key"),
            F.col("ts").alias("follow_ts"),
            F.col("event_id").alias("follow_id"),
            F.col("event_type").alias("follow_type"),
            F.col("value").alias("follow_value"),
            F.floor(F.unix_timestamp(F.col("ts")) / B).alias("_fb"),
        )
    )
    f = f_base.select(
        "f_key", "follow_ts", "follow_id", "follow_type", "follow_value",
        F.col("_fb").alias("f_bkt"),
    ).unionByName(
        f_base.select(
            "f_key", "follow_ts", "follow_id", "follow_type",
            "follow_value", (F.col("_fb") - 1).alias("f_bkt"),
        )
    )
    cond = (
        (F.col("f_key") == F.col("l_key"))
        & (F.col("f_bkt") == F.col("l_bkt"))
        & (F.col("lead_ts") <= F.col("follow_ts"))
        & (F.col("lead_ts") >= F.col("follow_ts") - F.expr(f"interval {max_delay}"))
    )
    return f.join(l, cond, "inner").select(
        F.col("f_key").alias("user_id"),
        "follow_id",
        "follow_type",
        "follow_ts",
        "follow_value",
        "lead_id",
        "lead_type",
        "lead_ts",
    )
