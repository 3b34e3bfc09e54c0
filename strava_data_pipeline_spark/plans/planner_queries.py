"""Cost-based-planner audit queries (SURVEY.md §2, r6 tenth pack,
rows 175-177): the queries that measure whether the STATISTICS the
engine plans with (table_stats NDVs, uniformity assumptions,
equi-depth layouts) actually describe the data — join-cardinality
estimates vs truth, equality-selectivity estimates vs truth, and a
size-based compaction plan. A CBO that never audits its estimates
ships 100 TB plans built on fiction; these are the audit.

All estimate arithmetic is BIGINT (integer div), all "actual" values
are computed from per-key COUNT frames (never by materializing the
estimated join), and the only floats are final rounded ratios of
identical exact integers.

No reference parity lines: beyond-reference operators per the task
brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strava_data_pipeline_spark.functions.hashing import md5_u32
from strava_data_pipeline_spark.functions.local_frames import one_slice_frame
from strava_data_pipeline_spark.plans.registry import register
from strava_data_pipeline_spark.sources.catalog import load_table
from strava_data_pipeline_spark.streaming.tuning import stream_tuned

from contextlib import nullcontext as _noop_ctx

# --------------------------------------------------------------------------
# 175. join_cardinality_audit — |A ⋈ B| estimates vs exact truth
# --------------------------------------------------------------------------
# Three join shapes: two FK controls (where the textbook estimate
# n_l·n_r / max(ndv) is exact because the dimension key is unique) and
# one date-alignment join (l_shipdate = o_orderdate) where the SAME
# formula goes wrong under skew — the case the audit exists for. The
# actual cardinality is Σ_k c_l(k)·c_r(k) over the per-key count
# frames: exact, and never materializes the (potentially huge) join.
_JCA_SPECS: tuple[tuple[str, str, str, str, str, str, str], ...] = (
    # (name, left table, left key spark, left key duck, right table,
    #  right key spark, right key duck)
    ("lineitem_orders_fk", "lineitem", "l_orderkey", "l_orderkey",
     "orders", "o_orderkey", "o_orderkey"),
    ("lineitem_part_fk", "lineitem", "l_partkey", "l_partkey",
     "part", "p_partkey", "p_partkey"),
    ("shipdate_orderdate", "lineitem",
     "cast(unix_timestamp(l_shipdate) div 86400 as bigint)",
     "CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400",
     "orders",
     "cast(unix_timestamp(o_orderdate) div 86400 as bigint)",
     "CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400"),
)


def _jca_oracle() -> str:
    parts = []
    for name, lt, _, lk, rt, _, rk in _JCA_SPECS:
        parts.append(f"""
SELECT '{name}' AS join_name, n_l, n_r, ndv_l, ndv_r,
       (n_l * n_r) // (CASE WHEN ndv_l > ndv_r THEN ndv_l ELSE ndv_r END)
         AS est_rows,
       actual_rows,
       round(actual_rows * 1.0 /
             ((n_l * n_r) // (CASE WHEN ndv_l > ndv_r THEN ndv_l ELSE ndv_r END)),
             6) AS err_ratio
FROM (
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM {lt}) AS n_l,
        (SELECT CAST(count(*) AS BIGINT) FROM {rt}) AS n_r,
        (SELECT CAST(count(DISTINCT {lk}) AS BIGINT) FROM {lt}) AS ndv_l,
        (SELECT CAST(count(DISTINCT {rk}) AS BIGINT) FROM {rt}) AS ndv_r,
        (SELECT CAST(coalesce(sum(cl * cr), 0) AS BIGINT) FROM
            (SELECT {lk} AS k, CAST(count(*) AS BIGINT) AS cl
             FROM {lt} GROUP BY 1) L
            JOIN
            (SELECT {rk} AS k, CAST(count(*) AS BIGINT) AS cr
             FROM {rt} GROUP BY 1) R
            USING (k)) AS actual_rows
)""")
    return " UNION ALL ".join(parts)


@register(
    "join_cardinality_audit", oracle=_jca_oracle(), tags=("ops", "layout")
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit: for three join shapes, the
    textbook CBO estimate n_l·n_r / max(ndv_l, ndv_r) against the
    exact cardinality. The two FK joins are controls (unique dimension
    key → the estimate is provably exact, err_ratio 1.0); the
    date-alignment join (shipdate = orderdate) is the treatment — the
    uniformity assumption misses temporal skew, and err_ratio measures
    by how much. This is the number that decides whether a 100 TB plan
    can trust its stats or needs a histogram.

    Scale design: the actual cardinality is Σ_k c_l(k)·c_r(k) over
    per-key COUNT frames — two map-side-combinable groupBys and a
    key-frame join, never the materialized join itself (the estimated
    join could be 10^12 rows; the count frames are domain-sized). NDVs
    are exact two-phase distincts. Everything that shuffles is
    (key, BIGINT)."""
    rows = []
    for name, lt, lk, _, rt, rk, _ in _JCA_SPECS:
        lf = load_table(spark, sf_dir, lt).select(F.expr(lk).alias("k"))
        rf = load_table(spark, sf_dir, rt).select(F.expr(rk).alias("k"))
        lc = lf.groupBy("k").agg(F.count("*").cast("bigint").alias("cl"))
        rc = rf.groupBy("k").agg(F.count("*").cast("bigint").alias("cr"))
        stats = (
            lc.agg(
                F.sum("cl").cast("bigint").alias("n_l"),
                F.count("*").cast("bigint").alias("ndv_l"),
            )
            .crossJoin(
                rc.agg(
                    F.sum("cr").cast("bigint").alias("n_r"),
                    F.count("*").cast("bigint").alias("ndv_r"),
                )
            )
            .crossJoin(
                lc.join(rc, "k").agg(
                    F.coalesce(
                        F.sum(F.col("cl") * F.col("cr")), F.lit(0)
                    )
                    .cast("bigint")
                    .alias("actual_rows")
                )
            )
        )
        est = F.expr(
            "(n_l * n_r) div (CASE WHEN ndv_l > ndv_r THEN ndv_l ELSE ndv_r END)"
        )
        rows.append(
            stats.select(
                F.lit(name).alias("join_name"),
                "n_l",
                "n_r",
                "ndv_l",
                "ndv_r",
                est.alias("est_rows"),
                "actual_rows",
                F.round(F.col("actual_rows") * F.lit(1.0) / est, 6).alias(
                    "err_ratio"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# --------------------------------------------------------------------------
# 176. selectivity_audit — equality-predicate estimates vs truth
# --------------------------------------------------------------------------
# Uniformity says every o_custkey matches N/ndv rows. The probe set
# (every 199th customer) measures the real dispersion around that
# single number — the per-value error a histogram or MCV list would
# fix. Customers with zero orders are kept (actual 0): the estimate
# is also wrong about absent keys.
_SEL_ORACLE = """
WITH stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv
    FROM orders
), probes AS (
    SELECT c_custkey AS probe FROM customer WHERE c_custkey % 199 = 1
), actual AS (
    SELECT o_custkey AS probe, CAST(count(*) AS BIGINT) AS actual_rows
    FROM orders GROUP BY 1
)
SELECT p.probe, s.n, s.ndv,
       s.n // s.ndv AS est_rows,
       coalesce(a.actual_rows, 0) AS actual_rows,
       coalesce(a.actual_rows, 0) - s.n // s.ndv AS err_rows
FROM probes p CROSS JOIN stats s
LEFT JOIN actual a ON a.probe = p.probe
"""


@register("selectivity_audit", oracle=_SEL_ORACLE, tags=("ops", "layout"))
def selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-selectivity audit: the uniformity estimate N/ndv for
    `o_custkey = ?` against the true per-value count, over a
    deterministic probe set (every 199th customer, zero-order
    customers included — the estimate is wrong about absent keys too).
    The err_rows distribution is what justifies (or retires) MCV lists
    and histograms in the planner.

    Scale design: one (key, count) frame from a map-side groupBy, one
    1-row (N, ndv) stats broadcast onto the bounded probe set, one
    key-partitioned LEFT join probe-to-frame. The fact table is read
    once; nothing wider than (BIGINT, BIGINT) shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    actual = orders.groupBy(F.col("o_custkey").alias("probe")).agg(
        F.count("*").cast("bigint").alias("actual_rows")
    )
    stats = actual.agg(
        F.sum("actual_rows").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("ndv"),
    )
    probes = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 199 == 1)
        .select(F.col("c_custkey").alias("probe"))
    )
    est = F.expr("n div ndv")
    return (
        probes.crossJoin(F.broadcast(stats))
        .join(actual, "probe", "left")
        .select(
            "probe",
            "n",
            "ndv",
            est.alias("est_rows"),
            F.coalesce("actual_rows", F.lit(0)).cast("bigint").alias(
                "actual_rows"
            ),
            (F.coalesce("actual_rows", F.lit(0)) - est)
            .cast("bigint")
            .alias("err_rows"),
        )
    )


# --------------------------------------------------------------------------
# 177. compaction_plan — size-based small-file compaction bins
# --------------------------------------------------------------------------
# Greedy sequential fill in day order: a day's bin is cum_before //
# TARGET — deterministic, order-stable, and the same integer on both
# engines. Day payload bytes are derived from row counts and measured
# string lengths (a real deployment reads file sizes from the
# manifest; the PLAN arithmetic is identical).
_COMPACT_TARGET = 256 * 1024

_COMPACT_ORACLE = f"""
WITH days AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(40 * count(*)
                + sum(strlen(props) + strlen(event_type))
             AS BIGINT) AS day_bytes
    FROM events GROUP BY 1
), planned AS (
    SELECT day, n_rows, day_bytes,
           CAST(coalesce(sum(day_bytes) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {_COMPACT_TARGET} AS BIGINT) AS bin
    FROM days
)
SELECT day, n_rows, day_bytes, bin FROM planned
"""


@register("compaction_plan", oracle=_COMPACT_ORACLE, tags=("ops", "layout"))
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan for the day-partitioned event store:
    per day, its payload size and the merged output file (bin) it
    lands in under greedy sequential fill toward a 256 KiB target —
    the OPTIMIZE/compact planning pass that keeps a streaming sink's
    thousands of tiny daily files from drowning the scan scheduler.

    Scale design: the fact collapses to the per-day frame (one
    map-side groupBy; day count is bounded by the calendar, not the
    data), and the bin assignment is one cumulative window over that
    domain frame — bin = cum_before // target, pure BIGINT, identical
    on both engines and stable under re-planning (appending days never
    reshuffles earlier bins, so re-running compaction is incremental
    by construction)."""
    days = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.expr("cast(unix_timestamp(ts) div 86400 as bigint)").alias("day")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (
                F.lit(40) * F.count("*")
                + F.sum(
                    F.octet_length("props") + F.octet_length("event_type")
                )
            )
            .cast("bigint")
            .alias("day_bytes"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return days.select(
        "day",
        "n_rows",
        "day_bytes",
        F.coalesce(F.sum("day_bytes").over(w), F.lit(0)).alias("cum_before"),
    ).select(
        "day",
        "n_rows",
        "day_bytes",
        # integer div, not double `/` + cast: a double quotient can
        # round up across the bin boundary before truncation
        F.expr(f"cum_before div {_COMPACT_TARGET}").cast("bigint").alias("bin"),
    )


# --------------------------------------------------------------------------
# 178. data_quality_checks — one-pass expectation audit per table
# --------------------------------------------------------------------------
# The dbt-test / Great-Expectations layer as queries: each check is a
# conditional COUNT, checks over the same table share one scan, and
# the FK check is a count-frame anti-join (ids only). Zero violations
# on healthy data is the expected output — the planted-violation test
# (tests/test_planner.py) proves each check actually detects.
_DQ_ORACLE = """
WITH o AS (
    SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS pk_dup,
           CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 END), 0)
             AS BIGINT) AS null_cust,
           CAST(coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 END), 0)
             AS BIGINT) AS nonpos_price
    FROM orders
), l AS (
    SELECT CAST(coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                                  THEN 1 END), 0) AS BIGINT) AS bad_discount,
           CAST(coalesce(sum(CASE WHEN l_quantity <= 0 THEN 1 END), 0)
             AS BIGINT) AS nonpos_qty,
           CAST(coalesce(sum(CASE WHEN
                abs(l_extendedprice * 100 - round(l_extendedprice * 100))
                  > 0.000001 THEN 1 END), 0) AS BIGINT) AS noncents_price
    FROM lineitem
), fk AS (
    SELECT CAST(count(*) AS BIGINT) AS orphans FROM (
        SELECT DISTINCT l_orderkey FROM lineitem
        EXCEPT SELECT o_orderkey FROM orders
    )
)
SELECT 'orders_pk_unique' AS check_name, pk_dup AS n_violations FROM o
UNION ALL SELECT 'orders_custkey_not_null', null_cust FROM o
UNION ALL SELECT 'orders_totalprice_positive', nonpos_price FROM o
UNION ALL SELECT 'lineitem_discount_in_range', bad_discount FROM l
UNION ALL SELECT 'lineitem_quantity_positive', nonpos_qty FROM l
UNION ALL SELECT 'lineitem_price_cents_exact', noncents_price FROM l
UNION ALL SELECT 'lineitem_orderkey_fk', orphans FROM fk
"""


@register("data_quality_checks", oracle=_DQ_ORACLE, tags=("ops", "pipeline"))
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality expectation audit (the dbt-test /
    Great-Expectations layer as a query): primary-key uniqueness,
    non-null and range expectations, cents-exactness of prices, and
    lineitem→orders referential integrity — one (check, violations)
    row each. Zero everywhere is the healthy output; the planted-
    violation test proves each check detects its failure class.

    Scale design: all checks on the same table fold into ONE
    conditional-aggregate scan of it (orders: 3 checks, one scan;
    lineitem: 3 checks, one scan); the FK check anti-joins the
    DISTINCT key frames (ids only, map-side pre-aggregated). At
    100 TB this is the post-ingest gate that runs on every landed
    partition — O(#tables) scans and O(#checks) output rows, no
    joins wider than key frames."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def cnt(cond):
        return F.coalesce(
            F.sum(F.when(cond, F.lit(1))), F.lit(0)
        ).cast("bigint")

    o_stats = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("pk_dup"),
        cnt(F.col("o_custkey").isNull()).alias("null_cust"),
        cnt(F.col("o_totalprice") <= 0).alias("nonpos_price"),
    )
    l_stats = li.agg(
        cnt(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("bad_discount"),
        cnt(F.col("l_quantity") <= 0).alias("nonpos_qty"),
        cnt(
            F.abs(
                F.col("l_extendedprice") * 100
                - F.round(F.col("l_extendedprice") * 100)
            )
            > 0.000001
        ).alias("noncents_price"),
    )
    orphans = (
        li.select(F.col("l_orderkey").alias("k"))
        .distinct()
        .join(
            o.select(F.col("o_orderkey").alias("k")).distinct(),
            "k",
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("orphans"))
    )
    rows = o_stats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orders_pk_unique").alias("check_name"),
                    F.col("pk_dup").alias("n_violations"),
                ),
                F.struct(
                    F.lit("orders_custkey_not_null").alias("check_name"),
                    F.col("null_cust").alias("n_violations"),
                ),
                F.struct(
                    F.lit("orders_totalprice_positive").alias("check_name"),
                    F.col("nonpos_price").alias("n_violations"),
                ),
            )
        ).alias("c")
    ).select("c.check_name", "c.n_violations")
    rows_l = l_stats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem_discount_in_range").alias("check_name"),
                    F.col("bad_discount").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem_quantity_positive").alias("check_name"),
                    F.col("nonpos_qty").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem_price_cents_exact").alias("check_name"),
                    F.col("noncents_price").alias("n_violations"),
                ),
            )
        ).alias("c")
    ).select("c.check_name", "c.n_violations")
    rows_fk = orphans.select(
        F.lit("lineitem_orderkey_fk").alias("check_name"),
        F.col("orphans").alias("n_violations"),
    )
    return rows.unionAll(rows_l).unionAll(rows_fk)


# --------------------------------------------------------------------------
# 180. quarantine_audit — the streaming quality gate's committed record
# --------------------------------------------------------------------------
# The driver-hashable face of streaming/quality_gate.py (VERDICT r6
# task 6; pattern proven by snapshot_diff): the query runs the REAL
# availableNow foreachBatch sink over a planted-violation event feed,
# then audits the COMMITTED artifacts — quarantine audit rows joined
# back to their batch, published rows re-audited from the target. The
# oracle recomputes routing and violation counts from `events` by pure
# arithmetic, so the hash only matches if the gate routed every batch
# correctly AND the committed audit counts are exact.
#
# Feed construction (deterministic per event_id, one micro-batch per
# batch_key = event_id % 4 via one landed file each + maxFilesPerTrigger=1):
#   batch 1: user_id NULLed where event_id % 97 == 0  -> quarantined
#   batch 3: value -> -(value+1) where event_id % 89 == 0 -> quarantined
#   batches 0, 2: untouched                            -> published
_QAUDIT_ORACLE = """
WITH feed AS (
    SELECT event_id,
           CAST(event_id % 4 AS INT) AS batch_key,
           CASE WHEN event_id % 4 = 1 AND event_id % 97 = 0
                THEN NULL ELSE user_id END AS user_id,
           ts,
           CASE WHEN event_id % 4 = 3 AND event_id % 89 = 0
                THEN -(value + 1) ELSE value END AS value
    FROM events
), agg AS (
    SELECT batch_key,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN event_id IS NULL THEN 1 END), 0)
             AS BIGINT) AS event_id_not_null,
           CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 END), 0)
             AS BIGINT) AS user_id_not_null,
           CAST(coalesce(sum(CASE WHEN ts IS NULL THEN 1 END), 0)
             AS BIGINT) AS ts_not_null,
           CAST(coalesce(sum(CASE WHEN value < 0 THEN 1 END), 0)
             AS BIGINT) AS value_non_negative
    FROM feed GROUP BY 1
), routed AS (
    SELECT *,
           CASE WHEN event_id_not_null + user_id_not_null
                     + ts_not_null + value_non_negative > 0
                THEN 'quarantine' ELSE 'publish' END AS route
    FROM agg
)
SELECT batch_key, route, 'event_id_not_null' AS check_name,
       event_id_not_null AS n_violations, n_rows FROM routed
UNION ALL SELECT batch_key, route, 'user_id_not_null',
       user_id_not_null, n_rows FROM routed
UNION ALL SELECT batch_key, route, 'ts_not_null',
       ts_not_null, n_rows FROM routed
UNION ALL SELECT batch_key, route, 'value_non_negative',
       value_non_negative, n_rows FROM routed
"""


@register("quarantine_audit", oracle=_QAUDIT_ORACLE, tags=("streaming", "ops"))
@stream_tuned
def quarantine_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audit of the streaming publish-or-quarantine gate:
    plant deterministic violations in an event feed, land it as four
    single-file micro-batches, run the REAL Structured Streaming sink
    (streaming/quality_gate.py::start_quality_gated_sink, availableNow
    + maxFilesPerTrigger=1), then report per (batch, check) what the
    COMMITTED artifacts say: quarantined batches' audit rows read back
    from the quarantine dir (joined to their batch_key through the
    quarantined rows themselves), published batches re-audited from
    the target — so a misrouted batch or a wrong committed count is a
    hash mismatch, not just a pytest failure.

    Scale shape: the gate itself is one conditional aggregate per
    micro-batch (O(batch), map-side combinable) + one write either
    way; this audit adds one scan of each committed side. The
    batch->batch_key association never trusts engine batch numbering:
    it is derived from the DATA inside each committed batch dir, so
    the result is stable under any file-listing order. Store root is
    deterministic per sf_dir and rebuilt per call (idempotent
    re-runs), exactly like snapshot_diff."""
    import hashlib
    import os
    import shutil

    from strava_data_pipeline_spark.streaming.quality_gate import (
        _checks,
        start_quality_gated_sink,
    )
    from strava_data_pipeline_spark.streaming.sync import EVENT_SCHEMA

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    root = f"spark-warehouse/_qaudit_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    landing = os.path.join(root, "landing")
    target = os.path.join(root, "target")
    quarantine = os.path.join(root, "quarantine")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(landing)

    ev = load_table(spark, sf_dir, "events")
    bk = F.col("event_id") % 4
    feed = ev.withColumn(
        "user_id",
        F.when(
            (bk == 1) & (F.col("event_id") % 97 == 0), F.lit(None)
        ).otherwise(F.col("user_id")),
    ).withColumn(
        "value",
        F.when(
            (bk == 3) & (F.col("event_id") % 89 == 0),
            -(F.col("value") + F.lit(1.0)),
        ).otherwise(F.col("value")),
    )
    cols = [f.name for f in EVENT_SCHEMA.fields]
    from strava_data_pipeline_spark.plans.streaming_faces import _land_many

    # one part-file per batch_key (maxFilesPerTrigger=1 makes each file
    # one micro-batch); the gate's fold is order-insensitive, so the
    # pinned mtimes only make the batch split deterministic
    _land_many(
        landing,
        [
            (feed.where(bk == k).select(*cols), 1_000_000 + k)
            for k in range(4)
        ],
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    start_quality_gated_sink(stream, target, quarantine, ckpt).awaitTermination()

    check_names = [name for name, _ in _checks()]

    def grouped_audit(df: DataFrame, route: str) -> DataFrame:
        """(batch_key, route, check_name, n_violations, n_rows) by
        re-running the gate's conditional aggregate per batch_key."""
        aggs = [
            F.coalesce(F.sum(F.when(pred, F.lit(1))), F.lit(0))
            .cast("bigint")
            .alias(name)
            for name, pred in _checks()
        ] + [F.count("*").cast("bigint").alias("n_rows")]
        g = df.groupBy(
            (F.col("event_id") % 4).cast("int").alias("batch_key")
        ).agg(*aggs)
        structs = [
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("n_violations"),
            )
            for name in check_names
        ]
        return g.select(
            "batch_key",
            F.lit(route).alias("route"),
            F.explode(F.array(*structs)).alias("c"),
            "n_rows",
        ).select(
            "batch_key", "route", "c.check_name", "c.n_violations", "n_rows"
        )

    # Either side can legitimately be EMPTY — a corpus where no
    # event_id satisfies the planted predicates quarantines nothing,
    # and a tiny corpus can quarantine everything. spark.read.parquet
    # on a glob that matches no committed dir throws instead of
    # returning zero rows (ADVICE r7), so each side falls back to an
    # empty frame of the audit shape when its store is absent.
    audit_schema = (
        "batch_key int, route string, check_name string,"
        " n_violations bigint, n_rows bigint"
    )

    # published side: re-audit the landed rows (proves the target is
    # actually clean, not merely labeled clean). The isdir check
    # covers the nothing-published case; the AnalysisException catch
    # covers a dir that exists but holds no readable parquet (e.g.
    # marker files only), which fails schema inference the same way.
    from pyspark.errors import AnalysisException

    try:
        if not os.path.isdir(target):
            raise AnalysisException("no published batches")
        published = grouped_audit(spark.read.parquet(target), "publish")
    except AnalysisException:
        published = one_slice_frame(spark, [], audit_schema)

    # quarantined side: report the COMMITTED audit counts, associated
    # to their batch_key through the quarantined rows in the same
    # batch dir (each batch holds exactly one batch_key by
    # construction — engine batch numbering is never trusted)
    import glob as _glob

    if _glob.glob(os.path.join(quarantine, "batch_id=*", "rows")):
        bid = F.regexp_extract(
            F.input_file_name(), r"batch_id=(\d+)", 1
        ).cast("int")
        q_rows = spark.read.parquet(
            os.path.join(quarantine, "batch_id=*", "rows")
        ).withColumn("bid", bid)
        q_map = q_rows.groupBy("bid").agg(
            F.min(F.col("event_id") % 4).cast("int").alias("batch_key"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
        q_audit = spark.read.parquet(
            os.path.join(quarantine, "batch_id=*", "audit")
        ).withColumn("bid", bid)
        quarantined = q_audit.join(F.broadcast(q_map), "bid").select(
            "batch_key",
            F.lit("quarantine").alias("route"),
            "check_name",
            "n_violations",
            "n_rows",
        )
    else:
        quarantined = one_slice_frame(spark, [], audit_schema)
    return published.unionAll(quarantined)


# --------------------------------------------------------------------------
# 188. rollup_audit — the incremental rollup's committed table, audited
# --------------------------------------------------------------------------
# Second driver-hashable streaming face (pattern: quarantine_audit):
# run the REAL incremental rollup maintenance (streaming/rollup.py —
# per-batch deltas MERGED into a day-partitioned aggregate, replay
# markers, dynamic partition overwrite) over four micro-batches whose
# DAYS ALL OVERLAP (batch split by event_id % 4, so every day's
# partition is rewritten four times through the read-merge path), then
# hash the COMMITTED table against a single-pass SQL recompute. A
# dropped batch, a double-applied merge, or a partition overwrite that
# clobbers untouched days is a hash mismatch.
_ROLLUP_AUDIT_ORACLE = """
SELECT CAST(ts AS DATE) AS p_day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_value
FROM events GROUP BY 1, 2
"""


@register("rollup_audit", oracle=_ROLLUP_AUDIT_ORACLE, tags=("streaming", "ops"))
@stream_tuned
def rollup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audit of streaming incremental rollup maintenance:
    land the event table as four single-file micro-batches interleaved
    by event_id (every day appears in EVERY batch — the merge path,
    not the blind-append path, carries all the weight), run the real
    availableNow foreachBatch maintenance, and report the committed
    (p_day, event_type) rollup. The oracle recomputes the aggregate
    from `events` in one pass, so the hash only matches if four
    delta-merges compose to exactly the full-table aggregate —
    incremental maintenance proven equal to recompute on the COMMITTED
    artifact, not just in pytest.

    Scale shape: the maintenance itself is O(batch) per trigger plus a
    partition-pruned read of the touched days (streaming/rollup.py);
    this audit adds one scan of the committed rollup. Store root is
    deterministic per sf_dir, rebuilt per call — idempotent re-runs,
    exactly like snapshot_diff/quarantine_audit. total_value is EXACT
    integer cents end to end (r8, ADVICE r7): the rollup quantizes
    per-row to BIGINT cents and folds integers, so four merges equal
    one pass bit-for-bit — the oracle divides the same integer sum by
    100.0 and both engines emit the identical double. A float fold
    would be order-dependent and could flip a half-cent boundary."""
    import hashlib
    import os
    import shutil

    from strava_data_pipeline_spark.streaming.rollup import (
        start_rollup_maintenance,
    )
    from strava_data_pipeline_spark.streaming.sync import EVENT_SCHEMA

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    root = f"spark-warehouse/_rollupaudit_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    landing = os.path.join(root, "landing")
    rollup = os.path.join(root, "rollup")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(landing)

    ev = load_table(spark, sf_dir, "events")
    cols = [f.name for f in EVENT_SCHEMA.fields]
    from strava_data_pipeline_spark.plans.streaming_faces import _land_many

    _land_many(
        landing,
        [
            (ev.where(F.col("event_id") % 4 == k).select(*cols), 1_000_000 + k)
            for k in range(4)
        ],
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    start_rollup_maintenance(stream, rollup, ckpt).awaitTermination()

    return spark.read.parquet(rollup).select(
        "p_day",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        # committed value IS exact cents / 100.0 — no display rounding
        # needed, and none wanted: the hash compares the raw double
        F.col("total_value").cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# 190. attribution_audit — the stream-stream outer join's committed rows
# --------------------------------------------------------------------------
# Third driver-hashable streaming face (pattern: quarantine_audit /
# rollup_audit), covering the subtlest watermark semantics in the
# repo: streaming/joins.py::attribute_with_unmatched — a left-outer
# stream-stream event-time join whose unmatched rows may only emit
# AFTER the min-watermark across both sides passes the point where a
# match is provably impossible (deferred emission). The oracle is the
# equivalent batch LEFT JOIN, so a dropped late row, a double-emitted
# pair, or an unmatched row released early/never is a hash mismatch
# on the COMMITTED parquet — not just a pytest assertion.
_ATTR_AUDIT_ORACLE = """
WITH v AS (
    SELECT user_id, ts AS lead_ts, event_id AS lead_id,
           event_type AS lead_type
    FROM events WHERE event_id % 3 <> 0
), p AS (
    SELECT user_id, event_id AS follow_id, event_type AS follow_type,
           ts AS follow_ts, value AS follow_value
    FROM events WHERE event_id % 3 = 0
)
SELECT p.user_id, p.follow_id, p.follow_type, p.follow_ts,
       p.follow_value, v.lead_id, v.lead_type, v.lead_ts
FROM p LEFT JOIN v
  ON v.user_id = p.user_id
 AND v.lead_ts <= p.follow_ts
 AND v.lead_ts >= p.follow_ts - INTERVAL 30 MINUTE
"""


@register("attribution_audit", oracle=_ATTR_AUDIT_ORACLE, tags=("streaming", "ops"))
def attribution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audit of the stream-stream attribution join: split
    the event table into a lead feed (views: event_id % 3 != 0) and a
    follow feed (purchases: % 3 == 0), land it as four TIME-SLICED
    micro-batches (contiguous epoch quartiles — the order a real file
    feed lands in), run the REAL left-outer join
    (streaming/joins.py::attribute_with_unmatched, 30-min window, 1-h
    watermark) through a parquet sink, and hash the committed rows
    against the equivalent batch LEFT JOIN.

    Mechanics the audit pins down:
    - Batch ORDER is load-bearing (unlike quarantine/rollup_audit,
      whose folds are order-insensitive): a slice processed out of
      order would put rows behind the advanced watermark and DROP
      them. Slices are landed one file each and their mtimes set a
      second apart (os.utime) because the file source orders pending
      files by modification time — equal mtimes would leave the order
      to listing luck.
    - Deferred emission needs a watermark PAST the last real follow's
      window before unmatched rows release, and availableNow stops at
      the last data file — a watermark advanced by the LAST batch
      would never get a batch to run in. Two sentinel flush batches
      (user_id -1, ts far beyond the corpus, one row per SIDE — the
      global watermark is the min across both withWatermark nodes)
      provide that: flush 1 advances the watermark, and flush 2's own
      micro-batch (maxFilesPerTrigger=1 gives every file its own batch
      boundary inside ONE availableNow run) is where every real
      unmatched follow finalizes. Sentinels filter out of the audit
      by id; the second flush's own rows are the only state left
      pending, exactly as a forever-running production stream would
      hold its tail.
    - No real row is ever late: slice k+1's min event time exceeds
      slice k's max, so the watermark (max - 1h) always trails the
      next batch's data — the audit proves clean-feed semantics; late
      DROPS are pinned separately by pytest where they are the
      intended behavior.

    Scale shape: state per side is bounded by watermark + delay of
    event time (the range conjunct is what lets Spark expire buffered
    rows — joins.py's contract); the audit adds one scan of the
    committed output. Store root is deterministic per sf_dir and
    rebuilt per call, exactly like the other two streaming faces.

    HOT-KEY rationale (r10 skew rehearsal): on the 25%-hot-user
    mult=100 corpus this face's symmetric hash join grinds one state
    partition quadratically (per input row it iterates ALL buffered
    same-key rows; killed after 56 CPU-minutes vs ~250s uniform). The
    remedy is the compound-(key, time-bucket) join —
    attribution_inner_audit below, exactly row-equal for the INNER
    feed. The LEFT-OUTER feed keeps the plain key on purpose: an
    unmatched follow is a per-key global fact no single bucket copy
    can decide, so a bucketed outer join would need a second stateful
    repair stage; the production hot-key shape is the bucketed inner
    join for attribution plus a batch anti-join for the unmatched
    tail (SCALING_SKEW_R10.json records both measurements)."""
    from strava_data_pipeline_spark.streaming.joins import (
        attribute_with_unmatched,
    )

    return _attr_face_impl(
        spark, sf_dir, attribute_with_unmatched, "_attraudit_"
    )


def _attr_face_impl(
    spark: SparkSession, sf_dir: str, joiner, root_prefix: str
) -> DataFrame:
    """Shared choreography of the two attribution faces (time-sliced
    mtime-staged landing, sentinel flushes, one availableNow run,
    size-adaptive store width, committed-parquet read-back) — one
    spelling so the audits differ ONLY in the join operator under
    test."""
    import hashlib
    import os
    import shutil

    from strava_data_pipeline_spark.streaming.sync import EVENT_SCHEMA

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    root = f"spark-warehouse/{root_prefix}{tag}"
    shutil.rmtree(root, ignore_errors=True)
    landing = os.path.join(root, "landing")
    target = os.path.join(root, "target")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(landing)

    from strava_data_pipeline_spark.plans.streaming_faces import _land_many

    ev = load_table(spark, sf_dir, "events")
    cols = [f.name for f in EVENT_SCHEMA.fields]
    # one job resolves the slice bounds AND the feed size the store-
    # width branch needs below (was two separate scans)
    lo, hi, n_events = ev.agg(
        F.min(F.col("ts").cast("long")),
        F.max(F.col("ts").cast("long")),
        F.count(F.lit(1)),
    ).first()
    step = (hi - lo) // 4 + 1

    def flush_batch(n: int) -> DataFrame:
        # one row per SIDE (ids -1 -> lead branch, -3 -> follow
        # branch) so BOTH withWatermark nodes advance — the global
        # watermark is their min
        from datetime import datetime, timezone

        from strava_data_pipeline_spark.functions.local_frames import (
            one_slice_frame,
        )

        t = datetime.fromtimestamp(hi + n * 864_000, tz=timezone.utc).replace(
            tzinfo=None
        )
        return one_slice_frame(
            spark,
            [(-1, t, -1, "view", 0.0), (-3, t, -1, "purchase", 0.0)],
            EVENT_SCHEMA,
        )

    def run_once() -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        views = stream.where(F.col("event_id") % 3 != 0)
        purchases = stream.where(F.col("event_id") % 3 == 0)
        joined = joiner(
            views, purchases, max_delay="30 minutes", watermark="1 hour"
        )
        (
            joined.writeStream.format("parquet")
            .option("path", target)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # State-store width is SIZE-ADAPTIVE (the pagerank persist-gate
    # pattern): this face runs TWO state stores per batch, so at
    # audit-feed volume per-partition commit overhead dominates (grid:
    # 52.8s @32 vs 14.7s @4 at sf0.1) — but the stored state is the
    # whole within-watermark event window, so at the mult=100
    # rehearsal's 10M-event feed a 4-wide store serializes the state
    # sort (the probe ran past 595s; 32-wide finished in 357s). Width
    # tracks state volume: narrow below 1M events, analytics width
    # above. Both modes hold the same oracle hash.
    from strava_data_pipeline_spark.streaming.tuning import (
        _ENV_KEY,
        scoped_stream_shuffle,
    )

    # None = analytics width. Mirror stream_tuned's precedence: the env
    # override ALWAYS wins (tuning.py's documented contract), so a
    # cluster-wide stream re-size reaches this face's small-feed branch
    # too (r8 ADVICE). n_events comes from the fused bounds+count job.
    width = (
        4
        if n_events <= 1_000_000 and _ENV_KEY not in os.environ
        else None
    )
    # SINGLE availableNow run, both flushes mtime-staged upfront: with
    # maxFilesPerTrigger=1 each file is its own micro-batch and the
    # watermark advances BETWEEN batches, so flush 2's batch already
    # runs with flush 1's advanced watermark — the restart the two-run
    # shape paid for (checkpoint + state-store reload, the dominant
    # cost of the mult=100 probe) bought nothing the in-run batch
    # boundary doesn't provide. Same committed rows, same oracle hash,
    # verified at sf0.01 and mult=100. All six slices land concurrently
    # (_land_many — batch order is carried by the pinned mtimes alone);
    # the landing writes are plain batch jobs, independent of the
    # stream-scoped shuffle width.
    _land_many(
        landing,
        [
            (
                ev.where(
                    (F.col("ts").cast("long") >= lo + k * step)
                    & (F.col("ts").cast("long") < lo + (k + 1) * step)
                ).select(*cols),
                1_000_000 + k,
            )
            for k in range(4)
        ]
        + [
            (flush_batch(1).select(*cols), 1_000_010),
            (flush_batch(2).select(*cols), 1_000_020),
        ],
    )
    with scoped_stream_shuffle(spark, width) if width else _noop_ctx():
        run_once()

    out = spark.read.parquet(target).where(F.col("follow_id") >= 0)
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("follow_id").cast("bigint").alias("follow_id"),
        "follow_type",
        "follow_ts",
        F.col("follow_value").cast("double").alias("follow_value"),
        F.col("lead_id").cast("bigint").alias("lead_id"),
        "lead_type",
        "lead_ts",
    )


# --------------------------------------------------------------------------
# 221. attribution_inner_audit — hot-key-immune bucketed stream join
# --------------------------------------------------------------------------
# The same-oracle remedy the r10 hot-user rehearsal demanded: the
# symmetric hash join's per-key state iteration is quadratic in the
# hot key's rows (attribution_audit's docstring records the killed
# 56-CPU-minute grind at 25%-hot mult=100). This face runs the SAME
# landing/flush choreography through streaming/joins.py::
# attribute_to_prior_event_bucketed — equality key widened to
# (user_id, time_bucket) with bucket = max_delay, follow side
# duplicated into its two admissible slots, every true pair matching
# exactly one copy — and hashes the committed rows against the plain
# batch INNER join (the bucketing is invisible to the oracle, which is
# the whole point).
_ATTR_INNER_ORACLE = """
WITH v AS (
    SELECT user_id, ts AS lead_ts, event_id AS lead_id,
           event_type AS lead_type
    FROM events WHERE event_id % 3 <> 0
), p AS (
    SELECT user_id, event_id AS follow_id, event_type AS follow_type,
           ts AS follow_ts, value AS follow_value
    FROM events WHERE event_id % 3 = 0
)
SELECT p.user_id, p.follow_id, p.follow_type, p.follow_ts,
       p.follow_value, v.lead_id, v.lead_type, v.lead_ts
FROM p JOIN v
  ON v.user_id = p.user_id
 AND v.lead_ts <= p.follow_ts
 AND v.lead_ts >= p.follow_ts - INTERVAL 30 MINUTE
"""


@register(
    "attribution_inner_audit",
    oracle=_ATTR_INNER_ORACLE,
    tags=("streaming", "ops"),
)
def attribution_inner_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committed-artifact audit of the BUCKETED inner attribution join
    (streaming/joins.py::attribute_to_prior_event_bucketed): identical
    time-sliced landing, sentinel flushes, and single availableNow run
    as attribution_audit (_attr_face_impl — the faces differ only in
    the join operator), hashed against the equivalent batch INNER
    join. The compound (user_id, time_bucket) equality key fragments a
    hot user's state across buckets, so per-row state iteration is
    bounded by two buckets of that user instead of its whole history —
    the measured remedy for the quadratic hot-key grind
    (SCALING_SKEW_R10.json)."""
    from strava_data_pipeline_spark.streaming.joins import (
        attribute_to_prior_event_bucketed,
    )

    return _attr_face_impl(
        spark, sf_dir, attribute_to_prior_event_bucketed, "_attrinner_"
    )


# --------------------------------------------------------------------------
# 224. attribution_unmatched_audit — hot-key LEFT OUTER as inner + anti (r11)
# --------------------------------------------------------------------------
# Closes the one streaming scale hazard the r10 verdict left answered
# only in prose: the LEFT-OUTER attribution result on a hot-key corpus
# where the plain-key outer join is unrunnable (SCALING_SKEW_R10:
# killed at >1500s on the 25%-hot-user mult=100 feed). An unmatched
# follow is a per-key GLOBAL fact no single bucket copy can decide, so
# the outer join itself cannot bucket — but the COMPOSITION can: run
# the hot-key-immune bucketed INNER stream join (output-linear under
# skew, measured), then recover the unmatched-follow tail with a batch
# LEFT ANTI join of the landed follows against the COMMITTED inner
# output's follow_ids. The anti join is a plain equi-shuffle on
# follow_id — no per-key state iteration, no quadratic grind — and the
# union is row-for-row the plain batch LEFT JOIN, which is exactly the
# oracle (shared with attribution_audit).
@register(
    "attribution_unmatched_audit",
    oracle=_ATTR_AUDIT_ORACLE,
    tags=("streaming", "ops"),
)
def attribution_unmatched_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production LEFT-OUTER attribution for hot-key corpora: the
    bucketed inner stream join (attribute_to_prior_event_bucketed,
    same _attr_face_impl choreography as the other two faces) UNION
    the unmatched-follow tail, recovered by batch LEFT ANTI join of
    the landed follow feed against the committed inner rows' distinct
    follow_ids. Both legs read committed artifacts — the stream sink
    parquet and the landing files the stream actually consumed — so a
    pair dropped by the stream join or a follow wrongly claimed as
    matched is a hash mismatch against the batch LEFT JOIN oracle,
    not just a pytest assertion. Scale: the stream leg is the measured
    output-linear hot-key remedy; the anti leg shuffles only
    (follow_id) pairs on a high-cardinality key, skew-free by
    construction."""
    import hashlib

    from strava_data_pipeline_spark.streaming.joins import (
        attribute_to_prior_event_bucketed,
    )

    inner = _attr_face_impl(
        spark, sf_dir, attribute_to_prior_event_bucketed, "_attrunm_"
    )
    # the landing dir _attr_face_impl used (deterministic per sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    landing = f"spark-warehouse/_attrunm_{tag}/landing"
    landed = spark.read.parquet(landing)
    follows = landed.where(
        (F.col("event_id") >= 0) & (F.col("event_id") % 3 == 0)
    ).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("follow_id"),
        F.col("event_type").alias("follow_type"),
        F.col("ts").alias("follow_ts"),
        F.col("value").cast("double").alias("follow_value"),
    )
    matched = inner.select("follow_id").distinct()
    unmatched = follows.join(matched, "follow_id", "left_anti").select(
        "user_id",
        "follow_id",
        "follow_type",
        "follow_ts",
        "follow_value",
        F.lit(None).cast("bigint").alias("lead_id"),
        F.lit(None).cast("string").alias("lead_type"),
        F.lit(None).cast("timestamp").alias("lead_ts"),
    )
    return inner.unionByName(unmatched)


# --------------------------------------------------------------------------
# 220. bloom_semi_join — runtime Bloom-filter join reduction (fact-fact)
# --------------------------------------------------------------------------
# The classic 100 TB join trick the surface did not yet demonstrate
# (VERDICT r9 task 9): when the selective side of a fact-fact join is
# too big to broadcast, build a BLOOM FILTER over its join keys — a
# constant-size bitmap however many keys — and pre-filter the huge
# probe side BEFORE its shuffle, so only rows that can possibly match
# pay exchange bytes. The filter is semantically TRANSPARENT (false
# positives are removed by the real join that follows), which is what
# makes it safe to size adaptively: m scales with the measured key
# count (one bounded count job on the already-filtered build side,
# the documented driver-collect allowlist shape) WITHOUT the oracle
# depending on m, k, or the FPR. The same bitmap-as-one-row machinery
# as decontaminate_bloom (m/64 BIGINT words, k=3 md5_u32 probes,
# getbit tests inside whole-stage codegen); the join is pinned
# SHUFFLE_HASH because the 100 TB shape this demonstrates is exactly
# the one where broadcast is off the table — locally a broadcast
# would win, and the docstring says so.
_BSJ_PRICE = 400000.0


_BSJ_ORACLE = f"""
WITH sel AS (
    SELECT o_orderkey FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= {_BSJ_PRICE}
)
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(month(l_shipdate) AS INT) AS ship_month,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem JOIN sel ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def _bsj_prefilter(spark: SparkSession, sf_dir: str):
    """Build the Bloom pre-filter halves of bloom_semi_join: returns
    ``(li_pre, sel)`` — the lineitem frame already reduced by the
    broadcast bitmap's forall/getbit test, and the selective orders
    side. Split out so tests can COUNT the surviving probe rows and
    pin the actual reduction (matches + FPR noise), not just the plan
    strings (r10 ADVICE).

    ONE pass over the build side (r11 VERDICT task 6): the old shape
    paid a separate ``sel.count()`` scan just to size m before the
    bitmap scan — a full extra read of the filtered orders side at
    every scale. Now the set-bit words are aggregated at the FIXED
    2^26-position resolution (the existing m cap) with an ``observe``
    riding the same scan to deliver n_sel, and the driver folds the
    sparse words down to the adaptive m afterwards. The fold is exact,
    not an approximation: m is a power of two dividing 2^26, so
    ``pos % m == (pos % 2^26) % m`` and the bit offset within a word
    (pos % 64) is unchanged — word w26 of the 2^26-grid ORs into word
    ``w26 % (m/64)``, giving bit-for-bit the bitmap the two-pass build
    produced. The sparse collect is bounded by min(3·n_sel, 2^20)
    words ≤ 8 MB — the same driver-side ceiling the dense bitmap
    already had."""
    import math

    from pyspark.sql import Observation

    _M0 = 1 << 26

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("bsj_n_sel")
    sel = o.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") >= _BSJ_PRICE)
    ).select("o_orderkey")

    def probes(key, m):
        return F.array(
            *[
                md5_u32(F.concat(F.lit(f"bsj{j}#"), key.cast("string"))) % m
                for j in range(3)
            ]
        )

    sparse = (
        sel.observe(obs, F.count(F.lit(1)).alias("n_sel"))
        .select(F.explode(probes(F.col("o_orderkey"), _M0)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            (F.col("pos") % 64).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(1L, b)")).alias("mask"))
        .collect()
    )
    n_sel = int(obs.get["n_sel"])
    m = min(_M0, max(1 << 16, 1 << math.ceil(math.log2(16 * max(n_sel, 1)))))
    dense = [0] * (m // 64)
    for row in sparse:
        # masks arrive as SIGNED 64-bit (bit 63 set -> negative);
        # fold in unsigned space, wrap back to BIGINT at the end
        dense[row["w"] % (m // 64)] |= row["mask"] & ((1 << 64) - 1)
    dense = [v - (1 << 64) if v >= (1 << 63) else v for v in dense]
    bitmap = one_slice_frame(spark, [(dense,)], "bitmap array<bigint>")
    li = load_table(spark, sf_dir, "lineitem")
    li_pre = (
        li.select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
        .crossJoin(F.broadcast(bitmap))
        .where(
            F.forall(
                probes(F.col("l_orderkey"), m),
                lambda p: F.getbit(
                    F.element_at(
                        "bitmap", (p / F.lit(64)).cast("int") + F.lit(1)
                    ),
                    (p % 64).cast("int"),
                )
                == 1,
            )
        )
        .drop("bitmap")
    )
    return li_pre, sel


@register("bloom_semi_join", oracle=_BSJ_ORACLE, tags=("planner", "bench"))
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue of lineitems belonging to urgent high-value
    orders, executed as a Bloom-reduced shuffle join: the ~4%-selective
    orders side folds its keys into one m-bit bitmap row (k=3 md5_u32
    probes; m = max(2^16, 16 bits/key rounded up to a power of two,
    capped 2^26 = 8 MB), broadcast onto lineitem where a forall/getbit
    test drops non-candidate rows inside codegen BEFORE the join
    exchange — at 16 bits/key and k=3 the FPR is ~2%, so the shuffle
    carries ~matching rows + 2% noise instead of the full fact table.
    The SHUFFLE_HASH hint pins the at-scale plan (dim past broadcast
    threshold); revenue is exact BIGINT cents per row before the sum
    (q10 discipline). Correctness never depends on the filter: the
    equi-join removes every false positive, so the oracle is the plain
    two-table join."""
    li_pre, sel = _bsj_prefilter(spark, sf_dir)
    return (
        li_pre.join(
            sel.hint("shuffle_hash"),
            li_pre["l_orderkey"] == sel["o_orderkey"],
        )
        .groupBy(
            F.year("l_shipdate").cast("int").alias("ship_year"),
            F.month("l_shipdate").cast("int").alias("ship_month"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100
                        + F.lit(0.5)
                    ).cast("bigint")
                ).cast("double")
                / 100.0
            ).alias("revenue"),
        )
    )
