"""Metastore seam: one partition-registration code path, two catalogs.

The reference registers completed partitions with a Hive Metastore
service over Thrift (HiveMetaStoreClient.add_partition — SURVEY.md
§0.1). Spark reaches the same service through its Hive catalog
implementation, and — crucially — the DDL the registration path issues
(CREATE EXTERNAL TABLE / ALTER TABLE ADD PARTITION / MSCK REPAIR) is
IDENTICAL whether the catalog is the in-process session catalog or an
external HMS. This module makes that a config choice instead of two
code paths:

- ``mode="session"`` (sandbox default): the in-process catalog — what
  every test and the driver runs. No external service needed.
- ``mode="hive-embedded"`` (round-15): ``enableHiveSupport()`` with NO
  Thrift URI — Spark's HiveExternalCatalog backed by an embedded Derby
  metastore. This executes the REAL Hive metastore client code
  (HiveMetaStoreClient.add_partition and friends, in-process) for the
  whole registration flow; the only difference from a production HMS
  is the missing network hop. tests/test_metastore_seam.py runs the
  full create → add_partitions → prune → MSCK flow against it in a
  subprocess (catalog choice is session-construction state, so it
  needs its own SparkSession).
- ``mode="hms"``: the deployment wiring — ``enableHiveSupport()`` plus
  ``hive.metastore.uris`` pointing at the Thrift endpoint. Catalog
  choice is session-construction-time state in Spark, so this mode is
  applied by ``configure_builder`` when the session is built; the
  registration DDL downstream is byte-identical.

No HMS Thrift SERVICE ships in-sandbox, so the hms mode itself is
covered by asserting the builder wiring, while the identical client
code path executes for real under hive-embedded.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class MetastoreConfig:
    mode: str = "session"  # "session" (in-process) | "hms" (external Thrift)
    hms_uri: str | None = None  # thrift://host:9083, required for hms mode
    database: str = "default"
    warehouse_dir: str | None = None


def configure_builder(builder, cfg: MetastoreConfig):
    """Apply the catalog choice to a SparkSession.Builder — the only
    point where session and hms modes differ."""
    if cfg.warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", cfg.warehouse_dir)
    if cfg.mode == "session":
        return builder
    if cfg.mode == "hive-embedded":
        # real HiveExternalCatalog + in-process HiveMetaStoreClient over
        # an embedded Derby metastore — no Thrift URI, no service
        return (
            builder.config("spark.sql.catalogImplementation", "hive")
            .enableHiveSupport()
        )
    if cfg.mode == "hms":
        if not cfg.hms_uri:
            raise ValueError("hms mode requires hms_uri (thrift://host:port)")
        return (
            builder.config("hive.metastore.uris", cfg.hms_uri)
            .config(
                "spark.sql.catalogImplementation", "hive"
            )
            .enableHiveSupport()
        )
    raise ValueError(f"unknown metastore mode: {cfg.mode!r}")


def qualified(cfg: MetastoreConfig, table: str) -> str:
    return f"{cfg.database}.{table}"


def ensure_database(spark: SparkSession, cfg: MetastoreConfig) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {cfg.database}")


def create_external_partitioned_table(
    spark: SparkSession,
    cfg: MetastoreConfig,
    table: str,
    columns_ddl: str,
    partitions: list[tuple[str, str]] | str,
    location: str,
) -> str:
    """CREATE the external table in the configured catalog. Same
    statement against the session catalog or an HMS-backed one.

    ``partitions`` is a list of ``(name, type)`` tuples — the DDL
    fragment and the PARTITIONED BY column list are both rendered from
    it, so a type containing a comma (``DECIMAL(10, 2)``) or arbitrary
    whitespace can never produce a malformed clause (the round-6 review
    finding against string-splitting a caller-formatted DDL). A plain
    DDL string is still accepted and parsed on commas OUTSIDE
    parentheses for callers with simple types."""
    if isinstance(partitions, str):
        import re

        parsed: list[tuple[str, str]] = []
        for frag in re.split(r",(?![^()]*\))", partitions):
            frag = frag.strip()
            if not frag:
                continue
            tokens = frag.split(None, 1)
            if len(tokens) != 2:
                raise ValueError(
                    f"partition DDL fragment {frag!r} must be "
                    "'<name> <type>' — pass a list of (name, type) "
                    "tuples for anything beyond simple types"
                )
            parsed.append((tokens[0], tokens[1]))
        partitions = parsed
    ensure_database(spark, cfg)
    name = qualified(cfg, table)
    part_ddl = ", ".join(f"{n} {t}" for n, t in partitions)
    part_cols = ", ".join(n for n, _ in partitions)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({columns_ddl}, {part_ddl}) "
        f"USING parquet PARTITIONED BY ({part_cols}) "
        f"LOCATION '{location}'"
    )
    return name


def add_partitions(
    spark: SparkSession,
    cfg: MetastoreConfig,
    table: str,
    parts: list[dict],
) -> None:
    """The add_partition RPC analogue: ONE batched ALTER statement per
    call (one catalog round-trip no matter how many partitions — the
    per-epoch path a streaming sink takes)."""
    if not parts:
        return
    clauses = " ".join(
        "PARTITION ("
        + ", ".join(
            f"{k}='{v}'" if isinstance(v, str) else f"{k}={v}"
            for k, v in p.items()
        )
        + ")"
        for p in parts
    )
    spark.sql(
        f"ALTER TABLE {qualified(cfg, table)} ADD IF NOT EXISTS {clauses}"
    )


def repair_partitions(
    spark: SparkSession, cfg: MetastoreConfig, table: str
) -> None:
    """Bulk partition recovery (MSCK) — the restart/backfill path."""
    spark.sql(f"MSCK REPAIR TABLE {qualified(cfg, table)}")


__all__ = [
    "MetastoreConfig",
    "add_partitions",
    "configure_builder",
    "create_external_partitioned_table",
    "ensure_database",
    "qualified",
    "repair_partitions",
]
