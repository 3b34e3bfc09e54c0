"""Reference REST-surface parity as a DataFrame service layer.

Every endpoint of the reference's API server
(/root/reference/internal/api/api.go) re-expressed over the engine:

| reference endpoint                | method here           |
| --------------------------------- | --------------------- |
| GET /api/v1/activities            | list_activities       |
| GET /api/v1/activities/{id}       | get_activity          |
| POST /admin/sync {days}           | sync_window           |
| GET /admin/keys                   | keys_for_user         |
| POST /admin/keys                  | create_api_key        |
| (middleware) X-API-Key validation | validate_api_key      |

Auth-token/OAuth flows are request-time concerns of a web tier, not of
the data engine; key *validation semantics* (active + unexpired —
user_api_keys.go:36) are implemented exactly.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from strava_data_pipeline_spark.operators.pagination import page_keyset, page_offset
from strava_data_pipeline_spark.sources.catalog import load_table

KEY_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("description", StringType()),
        StructField("created_at", TimestampType()),
        StructField("expires_at", TimestampType()),
        StructField("is_active", BooleanType()),
        StructField("user_id", LongType()),
    ]
)


class PipelineService:
    """Stateless facade over the engine; one instance per session."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        # Admin-created keys are a driver-scale dim; kept as local rows
        # and rebuilt as a literal DataFrame per query, so a long-lived
        # service never accumulates an unbounded unionByName lineage.
        # A production deployment stores keys in a table and mutates it
        # via merge_cdc (see the key_lifecycle registry query).
        self._key_rows: list[tuple] = []

    @property
    def _keys(self) -> DataFrame:
        return self.spark.createDataFrame(self._key_rows, KEY_SCHEMA)

    # -- activities (api.go:206, api.go:239) ------------------------------
    def list_activities(self, limit: int = 20, offset: int = 0) -> DataFrame:
        events = load_table(self.spark, self.sf_dir, "events")
        return page_offset(
            events, [("ts", True), ("event_id", True)], limit=limit, offset=offset
        ).drop("rn")

    def list_activities_after(self, cursor_ts, limit: int = 20) -> DataFrame:
        """Keyset variant — the deep-pagination path the reference lacks."""
        events = load_table(self.spark, self.sf_dir, "events")
        return page_keyset(
            events,
            [("ts", True), ("event_id", True)],
            cursor=F.col("ts") < F.lit(cursor_ts),
            limit=limit,
        )

    def get_activity(self, activity_id: int) -> DataFrame:
        return load_table(self.spark, self.sf_dir, "events").where(
            F.col("event_id") == activity_id
        )

    # -- sync (api.go:315) -------------------------------------------------
    def sync_window(self, days: int = 1) -> DataFrame:
        events = load_table(self.spark, self.sf_dir, "events")
        hwm = events.agg(F.max("ts").alias("_max_ts"))
        return (
            events.crossJoin(F.broadcast(hwm))
            .where(F.col("ts") >= F.col("_max_ts") - F.expr(f"INTERVAL {days} DAY"))
            .drop("_max_ts")
        )

    # -- api keys (user_api_keys.go) --------------------------------------
    def create_api_key(
        self, description: str, expiry_days: int = 30, user_id: int | None = None
    ) -> str:
        now = datetime.utcnow()
        key = hashlib.sha256(f"{description}:{now.isoformat()}".encode()).hexdigest()
        expires = now + timedelta(days=expiry_days) if expiry_days > 0 else None
        self._key_rows.append((key, description, now, expires, True, user_id))
        return key

    def validate_api_key(self, key: str, now: datetime | None = None) -> bool:
        """is_active AND (no expiry OR expiry in future) — user_api_keys.go:36."""
        now = now or datetime.utcnow()
        matched = self._keys.where(
            (F.col("key") == key)
            & F.col("is_active")
            & (F.col("expires_at").isNull() | (F.col("expires_at") > F.lit(now)))
        )
        return bool(matched.take(1))

    def keys_for_user(self, user_id: int) -> DataFrame:
        return self._keys.where(F.col("user_id") == user_id)
