"""Table catalog over the driver-generated parquet test schema.

The reference's "catalog" is a directory of key=value settings files that
name which tables exist and how they load (ExcelToCSVexport.ps1:61-116,
CSVtoSQLimport.ps1:96-150). Here the equivalent is a registry of named
parquet tables plus temp-view registration so both the DataFrame API and
``spark.sql`` can address them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Tables materialized by the driver under /root/testdata/sf*/ .
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier"})


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP.

    The driver's testdata timestamp flavor has changed between rounds
    (TIMESTAMP(NANOS) in earlier drops, naive micros — which Spark 4
    infers as NTZ — in later ones). NTZ breaks event-time APIs
    (``withWatermark``, ``unix_micros``); casting in the pinned-UTC
    session interprets the naive digits as UTC, so formatted output and
    interval arithmetic are byte-identical to the DuckDB oracle's naive
    semantics. Normalizing at the catalog makes every downstream operator
    independent of which flavor a given drop carries."""
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table. Columnar scan: Catalyst prunes columns and
    pushes filters into this source automatically.

    Timestamp handling (see :func:`_normalize_timestamps`): NTZ columns
    are cast to TIMESTAMP; an events table stored as TIMESTAMP(NANOS) —
    which the Spark parquet reader rejects ([PARQUET_TYPE_ILLEGAL]) — is
    read nanos-as-long and truncated to microseconds, the same truncation
    DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so both engines see
    identical values.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Try the plain read first: current drops store naive micros
        # (NTZ) and need no legacy conf. Only a TIMESTAMP(NANOS) drop —
        # which the reader rejects — turns on nanosAsLong, and then the
        # conf must STAY set: it is consulted again at execution, so a
        # scoped restore would fail the scan later. Setting it
        # unconditionally leaked legacy semantics into every subsequent
        # parquet read of the session (unrelated NANOS datasets silently
        # came back bigint instead of failing loudly — r10 review).
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        except Exception as exc:
            # Only the TIMESTAMP(NANOS) rejection warrants the legacy
            # conf (r10 ADVICE): a transient failure (missing file,
            # permissions) caught here would otherwise flip
            # nanosAsLong for the whole session — re-introducing the
            # legacy-semantics leak on an unrelated error path.
            msg = str(exc)
            if "NANOS" not in msg and "PARQUET_TYPE_ILLEGAL" not in msg and (
                "illegal Parquet type" not in msg
            ):
                raise
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (for spark.sql parity with the
    DuckDB oracle, which pre-registers the same view names)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
