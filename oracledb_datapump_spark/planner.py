"""Job planner: (operation, mode, PlanConfig, catalog) → ordered TablePlans.

This is the Spark-side analog of Oracle's metadata phase: the reference
applies METADATA_FILTERs server-side so only selected objects move
(/root/reference/src/oracledb_datapump/directives.py:122-134); we prune the
table list driver-side *before any Spark job is launched* (SURVEY.md §4),
which is the same optimization in plain Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .base import JobMode, Operation
from .catalog import Connector
from .directives import PlanConfig
from .dumpset import DumpSet
from .exceptions import UsageError


@dataclass
class TablePlan:
    """One table's worth of work."""

    schema: str
    table: str
    target_schema: str
    target_table: str
    parallel: int = 1
    predicate: str | None = None
    columns: list[str] | None = None
    as_of: str | None = None
    partition_by: str | None = None
    sort_by: str | None = None
    zorder_by: str | None = None
    merge_key: str | None = None
    merge_order: str | None = None
    merge_delete_col: str | None = None
    remap_data: list[tuple[str, str]] | None = None
    sample: tuple[int, str] | None = None  # (ppm, column), engine-side
    # (key, score, tiebreak) keep-best export dedup, engine-side
    dedup_keep_best: tuple[str, str, str] | None = None
    merge_prune: bool = False  # MERGE file-level zone-map pruning
    # import-only
    write_mode: str = "error"
    truncate: bool = False
    writer_options: dict[str, str] = field(default_factory=dict)
    # export-only
    codec: str = "snappy"
    data_included: bool = True  # False when TABLE/TABLE_DATA excluded
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def source_key(self) -> str:
        return f"{self.schema}.{self.table}"

    @property
    def target_key(self) -> str:
        return f"{self.target_schema}.{self.target_table}"


def _match_predicate(config: PlanConfig, table: str) -> str | None:
    return config.table_predicates.get(table, config.table_predicates.get("*"))


def _match_columns(config: PlanConfig, table: str) -> list[str] | None:
    return config.table_columns.get(table, config.table_columns.get("*"))


def plan_export(
    connector: Connector,
    operation: Operation,
    mode: JobMode,
    config: PlanConfig,
) -> list[TablePlan]:
    """Enumerate source tables per mode (reference job modes base.py:20-31):
    FULL = all non-system schemas (S2), SCHEMA = the INCLUDE_SCHEMA list
    (S1), TABLE = the INCLUDE_TABLE list (S3)."""
    if mode == JobMode.FULL:
        schemas = connector.list_schemas()
    elif mode == JobMode.SCHEMA:
        if not config.include_schemas:
            raise UsageError("SCHEMA mode requires at least one INCLUDE_SCHEMA")
        schemas = list(dict.fromkeys(config.include_schemas))
    elif mode == JobMode.TABLE:
        if not config.include_tables and not config.views_as_tables:
            raise UsageError(
                "TABLE mode requires at least one INCLUDE_TABLE "
                "(or VIEWS_AS_TABLES)"
            )
        schemas = list(dict.fromkeys(config.include_schemas)) or connector.list_schemas()
    else:
        # TABLESPACE/TRANSPORTABLE: physical-storage scope has no Spark
        # analog (SURVEY.md S4); treat the tablespace names as schema tags.
        schemas = list(dict.fromkeys(config.include_schemas)) or connector.list_schemas()

    # Excluding TABLE (or TABLE_DATA) => metadata-only export — the
    # reference's "no_data" idiom (tests/test_export.py:43-46).
    data_included = not (
        {"TABLE", "TABLE_DATA"} & config.exclude_object_types
    )

    plans: list[TablePlan] = []
    for schema in schemas:
        for table in connector.list_tables(schema):
            if mode == JobMode.TABLE and table not in config.include_tables:
                continue
            plans.append(
                TablePlan(
                    schema=schema,
                    table=table,
                    target_schema=schema,
                    target_table=table,
                    parallel=config.parallel,
                    predicate=_match_predicate(config, table),
                    columns=_match_columns(config, table),
                    as_of=config.as_of_marker(),
                    codec=config.parquet_codec(),
                    data_included=data_included,
                    partition_by=config.table_partition_by.get(
                        table, config.table_partition_by.get("*")
                    ),
                    sort_by=config.table_sort_by.get(
                        table, config.table_sort_by.get("*")
                    ),
                    zorder_by=config.table_zorder_by.get(
                        table, config.table_zorder_by.get("*")
                    ),
                    merge_key=config.table_merge_key.get(
                        table, config.table_merge_key.get("*")
                    ),
                    remap_data=config.table_remap_data.get(
                        table, config.table_remap_data.get("*")
                    ),
                    sample=config.table_sample.get(
                        table, config.table_sample.get("*")
                    ),
                    dedup_keep_best=config.table_dedup_keep_best.get(
                        table, config.table_dedup_keep_best.get("*")
                    ),
                    extra={
                        "dump_format": config.dump_format.lower(),
                        **(
                            {
                                "partition_scope": config.table_partition_scope[
                                    table
                                ]
                            }
                            if table in config.table_partition_scope
                            else {}
                        ),
                    },
                )
            )
    # VIEWS_AS_TABLES: materialize named source views as exported tables
    # (public Oracle Data Pump parameter; extension here — the reference
    # never implements it). A view that matches no selected schema fails
    # at plan time, mirroring Oracle's ORA-31655 posture.
    for view in config.views_as_tables:
        found = False
        for schema in schemas:
            lv = getattr(connector, "list_views", None)
            if lv and view in lv(schema):
                found = True
                plans.append(
                    TablePlan(
                        schema=schema,
                        table=view,
                        target_schema=schema,
                        target_table=view,
                        parallel=config.parallel,
                        predicate=_match_predicate(config, view),
                        columns=_match_columns(config, view),
                        codec=config.parquet_codec(),
                        extra={
                            "dump_format": config.dump_format.lower(),
                            "source_type": "VIEW",
                        },
                    )
                )
        if not found:
            raise UsageError(
                f"VIEWS_AS_TABLES: view {view!r} not found in any selected "
                "schema (or the connector exposes no view catalog)"
            )
    return plans


def plan_network_transfer(
    connector: Connector,
    mode: JobMode,
    config: PlanConfig,
) -> list[TablePlan]:
    """NETWORK_LINK planning: enumerate the SOURCE catalog like an export
    (so mode/filters/as-of/SAMPLE apply to the source), then graft the
    import-side contract onto each plan (schema remap, exists-action,
    MERGE family) — the plan a dump-set roundtrip would execute, minus
    the dump."""
    plans = plan_export(connector, Operation.IMPORT, mode, config)
    wmode, truncate = config.write_mode()
    for p in plans:
        p.target_schema = config.remap_schema.get(p.schema, p.schema)
        p.write_mode = wmode
        p.truncate = truncate
        p.merge_order = config.table_merge_order.get(
            p.table, config.table_merge_order.get("*")
        )
        p.merge_delete_col = config.table_merge_delete_col.get(
            p.table, config.table_merge_delete_col.get("*")
        )
        p.merge_prune = config.table_merge_prune.get(
            p.table, config.table_merge_prune.get("*", False)
        )
    return plans


def plan_import(
    dumpset: DumpSet,
    config: PlanConfig,
) -> list[TablePlan]:
    """Enumerate dump-set tables, applying remaps + exists-action
    (reference import path: handlers.py:137-149; REMAP_SCHEMA
    directives.py:449-450; TABLE_EXISTS_ACTION directives.py:372-376).

    Plans carry a ``topo_level`` derived from FK constraints captured in
    the export manifest: level-0 tables reference nothing; the engine
    barriers between levels so parents land before children (the ordering
    Oracle's import engine provides implicitly; SURVEY.md §7.3)."""
    mode, truncate = config.write_mode()
    constraints: dict[str, list[str]] = {}
    if dumpset.exists():
        constraints = dumpset.read_manifest().constraints
    levels = _topo_levels(constraints)
    plans: list[TablePlan] = []
    for schema, table in dumpset.list_tables():
        target_schema = config.remap_schema.get(schema, schema)
        if config.include_schemas and schema not in config.include_schemas:
            continue
        if config.include_tables and table not in config.include_tables:
            continue
        plans.append(
            TablePlan(
                schema=schema,
                table=table,
                target_schema=target_schema,
                target_table=table,
                parallel=config.parallel,
                predicate=_match_predicate(config, table),
                columns=_match_columns(config, table),
                write_mode=mode,
                truncate=truncate,
                merge_key=config.table_merge_key.get(
                    table, config.table_merge_key.get("*")
                ),
                merge_order=config.table_merge_order.get(
                    table, config.table_merge_order.get("*")
                ),
                merge_delete_col=config.table_merge_delete_col.get(
                    table, config.table_merge_delete_col.get("*")
                ),
                merge_prune=config.table_merge_prune.get(
                    table, config.table_merge_prune.get("*", False)
                ),
                extra={"topo_level": levels.get(f"{schema}.{table}", 0)},
            )
        )
    plans.sort(key=lambda p: (p.extra["topo_level"], p.source_key))
    return plans


def _topo_levels(constraints: dict[str, list[str]]) -> dict[str, int]:
    """Longest-path-from-root level per table in the FK DAG; cycles (e.g.
    self-referencing FKs) are broken by capping the depth."""
    levels: dict[str, int] = {}

    def level_of(key: str, seen: frozenset[str]) -> int:
        if key in levels:
            return levels[key]
        if key in seen:  # cycle — break
            return 0
        refs = [r for r in constraints.get(key, []) if r != key]
        lv = 1 + max(
            (level_of(r, seen | {key}) for r in refs), default=-1
        )
        levels[key] = lv
        return lv

    for k in constraints:
        level_of(k, frozenset())
    return levels


def estimate_plan(
    connector: Connector, plans: list[TablePlan], spark
) -> list[dict[str, Any]]:
    """ESTIMATE/ESTIMATE_ONLY (reference directives.py:299-305): size each
    table without moving data — stats/count queries only (SURVEY.md A3/P5)."""
    out = []
    for p in plans:
        try:
            df = connector.read_table(spark, p.schema, p.table, columns=p.columns)
            if p.predicate:
                df = df.filter(p.predicate)
            rows = df.count()
            width = len(df.columns)
            out.append(
                {
                    "table": p.source_key,
                    "estimated_rows": rows,
                    "estimated_bytes": rows * width * 16,  # coarse width heuristic
                }
            )
        except Exception as e:  # estimation must not fail the job
            out.append({"table": p.source_key, "error": str(e)})
    return out
