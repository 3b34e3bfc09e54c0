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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strava_data_pipeline_spark.plans.registry import register
from strava_data_pipeline_spark.sources.catalog import load_table

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
