"""Layout tests: partition pruning and bucketed exchange elimination
verified against the physical plan, not assumed."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from strava_data_pipeline_spark.sources.catalog import load_table
from strava_data_pipeline_spark.sources.layout import (
    read_day_range,
    write_bucketed,
    write_partitioned_by_day,
)

SF_DIR = "/root/testdata/sf0.001"


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_day_partition_pruning(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    root = str(tmp_path / "events_by_day")
    write_partitioned_by_day(events, root)

    narrow = read_day_range(spark, root, "2024-01-10", "2024-01-12")
    plan = _explain(narrow)
    assert "PartitionFilters" in plan and "p_day" in plan

    expected = events.where(
        (F.to_date("ts") >= "2024-01-10") & (F.to_date("ts") <= "2024-01-12")
    ).count()
    assert narrow.count() == expected
    # pruned scan must touch only 3 of ~30 day directories
    files = narrow.select(F.input_file_name()).distinct().collect()
    days = {f[0].split("p_day=")[1].split("/")[0] for f in files}
    assert days == {"2024-01-10", "2024-01-11", "2024-01-12"}


def test_bucketed_agg_skips_exchange(spark, tmp_path):
    # warehouse dir is a static conf; the managed table lands in the
    # default ./spark-warehouse (gitignored) and is dropped after
    events = load_table(spark, SF_DIR, "events")
    write_bucketed(events.select("event_id", "user_id", "value"), "ev_bucketed", "user_id")
    try:
        agg = (
            spark.table("ev_bucketed")
            .groupBy("user_id")
            .agg(F.sum("value").alias("total"))
        )
        plan = _explain(agg)
        # bucketed layout satisfies the agg's distribution: no shuffle
        assert "Exchange" not in plan
        assert agg.count() == events.select("user_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    import glob

    from strava_data_pipeline_spark.sources.catalog import load_table
    from strava_data_pipeline_spark.sources.layout import (
        compact_day_partitions,
        write_partitioned_by_day,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(2000)
    root = str(tmp_path / "fact")
    # land fragmented: 8 files per day partition (a streaming sink's
    # worth of micro-batch files)
    write_partitioned_by_day(events.repartition(8), root)
    day_dirs = sorted(glob.glob(f"{root}/p_day=*"))
    assert len(glob.glob(f"{day_dirs[0]}/part-*.parquet")) > 1
    before = {
        tuple(r) for r in spark.read.parquet(root).drop("p_day").collect()
    }
    days = [d.rsplit("=", 1)[1] for d in day_dirs[:2]]

    n = compact_day_partitions(spark, root, days=days, target_files=1)

    assert n == 2
    for d in day_dirs[:2]:  # compacted: exactly one file now
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1
    # untouched partition keeps its fragmented layout (not rewritten)
    assert len(glob.glob(f"{day_dirs[3]}/part-*.parquet")) > 1
    after = {
        tuple(r) for r in spark.read.parquet(root).drop("p_day").collect()
    }
    assert after == before


class TestZorder:
    def test_zvalue_interleaves_bits(self, spark):
        from strava_data_pipeline_spark.sources.layout import zvalue

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x int, y int"
        )
        got = [
            r["z"] for r in df.select(zvalue("x", "y").alias("z")).collect()
        ]

        def ref(x, y):
            z = 0
            for i in range(16):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        assert got == [ref(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)]]

    def test_box_predicate_prunes_zordered_files(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from strava_data_pipeline_spark.sources.catalog import load_table
        from strava_data_pipeline_spark.sources.layout import zorder_write

        events = load_table(spark, "/root/testdata/sf0.01", "events").select(
            "event_id", "user_id", F.floor("value").cast("bigint").alias("v")
        )
        z_path = str(tmp_path / "zordered")
        flat_path = str(tmp_path / "shuffled")
        zorder_write(events, z_path, "user_id", "v", n_files=16)
        # control: same data, same file count, no meaningful clustering
        events.repartition(16).write.parquet(flat_path)

        box = (
            (F.col("user_id").between(10, 30))
            & (F.col("v").between(100, 300))
        )

        def files_touched(path):
            hit = (
                spark.read.parquet(path)
                .where(box)
                .select(F.input_file_name().alias("f"))
                .distinct()
                .count()
            )
            return hit

        z_files = files_touched(z_path)
        flat_files = files_touched(flat_path)
        # the box covers ~2% of the (user, value) plane: the z-layout
        # must confine it to a strict minority of files while the
        # shuffled layout bleeds it across (almost) all of them
        assert flat_files >= 14, f"control layout unexpectedly clustered: {flat_files}"
        assert z_files <= flat_files // 2, (z_files, flat_files)
        # same rows either way — layout never changes the answer
        rows_z = spark.read.parquet(z_path).where(box).count()
        rows_flat = spark.read.parquet(flat_path).where(box).count()
        assert rows_z == rows_flat > 0

    def test_null_coordinates_rejected(self, spark, tmp_path):
        # min/max skip nulls, so null-coordinate rows would pass the
        # range check yet land a null _z outside curve pruning; the
        # writer must refuse them explicitly (ADVICE r4) — including
        # the all-NULL-y case that previously raised a bare TypeError
        import pytest

        from strava_data_pipeline_spark.sources.layout import zorder_write

        some_null = spark.createDataFrame(
            [(1, 5), (2, None), (3, 7)], "x int, y int"
        )
        with pytest.raises(ValueError, match="NULL"):
            zorder_write(some_null, str(tmp_path / "z1"), "x", "y")
        all_null_y = spark.createDataFrame(
            [(1, None), (2, None)], "x int, y int"
        )
        with pytest.raises(ValueError, match="NULL"):
            zorder_write(all_null_y, str(tmp_path / "z2"), "x", "y")
        # empty frame: nothing to check, empty write succeeds
        zorder_write(
            spark.createDataFrame([], "x int, y int"),
            str(tmp_path / "z3"),
            "x",
            "y",
        )


def test_compaction_target_files_fans_out_per_day(spark, tmp_path):
    # target_files > 1 must actually produce up to that many files per
    # day (the pre-r4 repartition hashed by p_day alone: target_files
    # was a silent no-op and every day serialized through one task)
    import glob

    from strava_data_pipeline_spark.sources.catalog import load_table
    from strava_data_pipeline_spark.sources.layout import (
        compact_day_partitions,
        write_partitioned_by_day,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(2000)
    root = str(tmp_path / "fact")
    write_partitioned_by_day(events.repartition(8), root)
    day_dirs = sorted(glob.glob(f"{root}/p_day=*"))
    before = {
        tuple(r) for r in spark.read.parquet(root).drop("p_day").collect()
    }
    days = [d.rsplit("=", 1)[1] for d in day_dirs[:2]]

    compact_day_partitions(spark, root, days=days, target_files=4)

    for d in day_dirs[:2]:
        n_files = len(glob.glob(f"{d}/part-*.parquet"))
        assert 2 <= n_files <= 4, f"{d}: {n_files} files"
    after = {
        tuple(r) for r in spark.read.parquet(root).drop("p_day").collect()
    }
    assert after == before
