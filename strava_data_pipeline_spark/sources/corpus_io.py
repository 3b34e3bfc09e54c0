"""JSONL / CSV corpus interchange (sources beyond parquet).

LLM corpora interchange as JSON-Lines (one doc per line); tabular dims
arrive as CSV. Parquet (sources/catalog.py) stays the engine-native
format — these readers exist for ingest/egress at the corpus boundary.

Scale rules encoded here:
- **Explicit schema always.** ``spark.read.json`` without a schema runs
  a full inference pass over the data — a second 100 TB scan before the
  first real one. Every reader takes (or defaults) a schema.
- **Corrupt lines are data, not exceptions.** A trillion-line crawl WILL
  contain broken JSON; PERMISSIVE mode + a ``_corrupt_record`` column
  quarantines them for audit instead of killing the job.
- **Splittability.** Uncompressed or zstd/bzip2 JSONL splits into
  byte-range tasks; a single .gz file becomes ONE task reading 100 GB.
  The writer therefore never defaults to gzip — it relies on many
  output files (one per task) for parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """Schema + the quarantine column (must be declared to be captured)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    observe_name: str | None = None,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema; malformed lines land
    in ``_corrupt_record`` with every data column null — filter
    ``good_docs``/``corrupt_docs`` downstream.

    Implemented as a line-splittable text scan + ``from_json`` rather
    than ``spark.read.json``: the parse is then an ordinary expression,
    so downstream plans may reference the corrupt column alone (the
    native JSON file source forbids exactly that —
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — which breaks
    the obvious ``corrupt_docs(df).count()`` audit). Cost is identical:
    one scan, per-line parsing, no inference pass.

    ``observe_name`` (opt-in): attach the :func:`observe_corrupt`
    counters under that name; the Observation rides on the returned
    frame as ``df.corrupt_observation`` — read
    ``.get["n_corrupt"]`` after the first action."""
    parsed = spark.read.text(path).select(
        F.from_json("value", _with_corrupt(schema)).alias("_d"),
        F.col("value"),
    )
    # iterate the DATA fields only: a caller schema that already
    # declares _corrupt_record would otherwise emit the column twice
    # and break every df[CORRUPT_COL] reference with AMBIGUOUS_REFERENCE
    data_fields = [f for f in schema.fields if f.name != CORRUPT_COL]
    out = parsed.select(
        *[F.col(f"_d.{f.name}").alias(f.name) for f in data_fields],
        # from_json stores the raw line in the struct's corrupt field;
        # surface it top-level (fall back to the raw line: a line that is
        # valid JSON but not an OBJECT parses to a null struct instead)
        F.when(
            F.col("_d").isNull() | F.col(f"_d.{CORRUPT_COL}").isNotNull(),
            F.col("value"),
        ).alias(CORRUPT_COL),
    )
    return _attach_observation(out, observe_name)


def _attach_observation(df: DataFrame, observe_name: str | None) -> DataFrame:
    """Wrap a reader's output in :func:`observe_corrupt` (when named)
    and ride the Observation on the frame itself, keeping the reader's
    plain-DataFrame return type. Quarantined rows then surface in
    metrics at the first action instead of only via a manual count."""
    if observe_name is None:
        return df
    df, obs = observe_corrupt(df, observe_name)
    df.corrupt_observation = obs
    return df


def observe_corrupt(df: DataFrame, name: str = "corpus_read"):
    """Attach (n_rows, n_corrupt) counters to a reader's plan so silent
    quarantining is VISIBLE: formerly-valid rows that now land in
    ``_corrupt_record`` (e.g. quoted embedded newlines read without
    ``multi_line=True``) show up in the metric after any action, at
    zero extra scans. Returns ``(df, Observation)``; read
    ``obs.get["n_corrupt"]`` after the first action and alert/abort on
    a nonzero count (same contract as operators/monitor.py)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(CORRUPT_COL).isNotNull(), 1)).alias(
                "n_corrupt"
            ),
        ),
        obs,
    )


def good_docs(df: DataFrame) -> DataFrame:
    return df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)


def corrupt_docs(df: DataFrame) -> DataFrame:
    """The quarantine stream: raw text of every malformed line."""
    return df.where(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)


def write_jsonl_corpus(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a corpus as JSONL, one file per task (that parallelism IS
    the read-side splittability story — no monolithic .gz)."""
    df.write.mode(mode).json(path)


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    multi_line: bool = False,
    observe_name: str | None = None,
) -> DataFrame:
    """Read a CSV dim/fact with an explicit schema (no inference scan);
    malformed rows quarantine in ``_corrupt_record`` like the JSONL
    reader.

    Default path: a line-splittable text scan + ``from_csv`` — the same
    restructuring the JSONL reader uses, for the same two reasons: the
    corrupt column stays an ordinary expression (the native CSV source
    raises QUERY_ONLY_CORRUPT_RECORD_COLUMN the moment a plan prunes to
    it — even ``good_docs(df).count()`` dies), and the scan byte-range
    splits. The header line is dropped by matching the schema's exact
    header string (what :func:`write_csv_table` emits); a data row that
    IS that exact line would be dropped too — declare ``header=False``
    for headerless feeds.

    ``multi_line=True`` switches to the native record-aware source for
    quoted embedded newlines — accepting BOTH costs: one task per file
    (multiLine parsing cannot split) and no corrupt-column-only
    queries. Keep it off unless the data genuinely contains them.

    ``observe_name`` (opt-in, same contract as :func:`read_jsonl_corpus`):
    attach :func:`observe_corrupt` counters so rows silently
    quarantining into ``_corrupt_record`` (the exact failure mode of
    reading embedded newlines WITHOUT ``multi_line``) raise a visible
    nonzero ``n_corrupt`` after the first action instead of shrinking
    the table quietly; the Observation rides on the returned frame as
    ``df.corrupt_observation``.
    """
    data_fields = [f for f in schema.fields if f.name != CORRUPT_COL]
    if multi_line:
        return _attach_observation(
            spark.read.schema(_with_corrupt(schema))
            .option("header", str(header).lower())
            .option("sep", delimiter)
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .csv(path),
            observe_name,
        )
    raw = spark.read.text(path)
    if header:
        hdr = delimiter.join(f.name for f in data_fields)
        raw = raw.where(F.col("value") != hdr)
    opts = {
        "sep": delimiter,
        "quote": '"',
        "escape": '"',
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
    }
    parsed = raw.select(
        F.from_csv("value", _with_corrupt(schema).simpleString(), opts).alias("_d"),
        F.col("value"),
    )
    out = parsed.select(
        *[F.col(f"_d.{f.name}").alias(f.name) for f in data_fields],
        F.when(
            F.col("_d").isNull() | F.col(f"_d.{CORRUPT_COL}").isNotNull(),
            F.col("value"),
        ).alias(CORRUPT_COL),
    )
    return _attach_observation(out, observe_name)


def write_csv_table(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    delimiter: str = ",",
) -> None:
    """Write CSV with RFC-4180 quote-doubling (escape='"') so the output
    round-trips through :func:`read_csv_table` — Spark's default
    backslash escaping does not. ``delimiter`` must match the reader's
    for the round-trip to hold."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC table — the columnar interchange format warehouses
    outside the parquet ecosystem (Hive/Trino deployments) hand over.
    Spark's native vectorized ORC reader supports the same pushdown /
    pruning contract as parquet, so downstream plans are unchanged."""
    return spark.read.orc(path)


def write_orc_table(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "zlib"
) -> None:
    """Write ORC with explicit codec; one file per task, splittable on
    read like the JSONL writer's layout story."""
    df.write.mode(mode).option("compression", compression).orc(path)
