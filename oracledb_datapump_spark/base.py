"""Core enums and typed metadata shared across the engine.

Parity reference: /root/reference/src/oracledb_datapump/base.py:5-63
(Operation, JobMode, Stage enums; ConnectDict/JobMetaData TypedDicts).
Re-expressed for a Spark-native engine: EXPORT reads a source catalog and
writes a Parquet dump set; IMPORT reads a dump set and writes to a target
catalog; SQL_FILE generates DDL from captured schemas (the reference
declares it but raises NotImplementedError — files.py:899-900; we implement
it as DDL-script generation).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, TypedDict


class StrEnum(str, enum.Enum):
    def __str__(self) -> str:  # pragma: no cover - trivial
        return self.value


class Operation(StrEnum):
    """Direction of data movement (reference base.py:5-17)."""

    EXPORT = "EXPORT"
    IMPORT = "IMPORT"
    SQL_FILE = "SQL_FILE"


class JobMode(StrEnum):
    """Scope of the job (reference base.py:20-31).

    TABLESPACE/TRANSPORTABLE are Oracle-physical concepts; we accept them
    and treat tablespace names as storage-location tags (SURVEY.md S4).
    """

    FULL = "FULL"
    SCHEMA = "SCHEMA"
    TABLE = "TABLE"
    TABLESPACE = "TABLESPACE"
    TRANSPORTABLE = "TRANSPORTABLE"


class Stage(enum.IntEnum):
    """When a directive is applied (reference base.py:34-37)."""

    PRE = 1
    DATAPUMP = 2
    POST = 3


class JobState(StrEnum):
    """Job lifecycle states (reference status.py:32-47)."""

    UNDEFINED = "UNDEFINED"
    DEFINING = "DEFINING"
    EXECUTING = "EXECUTING"
    COMPLETING = "COMPLETING"
    COMPLETED = "COMPLETED"
    COMPLETED_WITH_ERRORS = "COMPLETED_WITH_ERRORS"
    STOP_PENDING = "STOP_PENDING"
    STOPPING = "STOPPING"
    STOPPED = "STOPPED"
    IDLING = "IDLING"
    NOT_RUNNING = "NOT_RUNNING"
    ERROR = "ERROR"


TERMINAL_STATES = frozenset(
    {
        JobState.COMPLETED,
        JobState.COMPLETED_WITH_ERRORS,
        JobState.STOPPED,
        # ERROR/NOT_RUNNING are terminal too: a failed async job sets
        # ERROR, and poll_for_completion (default timeout=None) must not
        # spin forever on it.
        JobState.ERROR,
        JobState.NOT_RUNNING,
    }
)


class ConnectDict(TypedDict, total=False):
    """Connection spec (reference base.py:58-63). For the Spark engine a
    connection is either a JDBC url+properties or a named test connector
    ("duckdb://<path>", "parquet://<dir>")."""

    url: str
    user: str
    password: str
    driver: str
    properties: dict[str, str]


@dataclass
class JobMetaData:
    """Manifest written next to the dump set
    (reference base.py:43-56, job.py:235-259)."""

    job_name: str
    job_owner: str
    job_date: datetime
    operation: str
    mode: str
    schemas: list[str] = field(default_factory=list)
    schema_versions: dict[str, str] = field(default_factory=dict)
    tablespaces: dict[str, list[str]] = field(default_factory=dict)
    dumpfiles: list[str] = field(default_factory=list)
    directives: list[dict[str, Any]] = field(default_factory=list)
    as_of: str | None = None
    tables: dict[str, dict[str, Any]] = field(default_factory=dict)
    # FK adjacency captured at export ("schema.table" → [referenced
    # "schema.table", …]); drives import topo-ordering (SURVEY.md §7.3)
    constraints: dict[str, list[str]] = field(default_factory=dict)
    # column-level key metadata ("schema.table" → {"primary_key": [...],
    # "foreign_keys": [{"columns", "ref_table", "ref_columns"}, ...]});
    # drives SQL_FILE's PRIMARY KEY / FOREIGN KEY clause rendering
    constraint_columns: dict[str, dict] = field(default_factory=dict)
    engine: str = "oracledb-datapump-spark"

    def to_dict(self) -> dict[str, Any]:
        from .util import JsonEncoder  # local import to avoid cycle

        d = {
            "job_name": self.job_name,
            "job_owner": self.job_owner,
            "job_date": JsonEncoder.format_dt(self.job_date),
            "operation": self.operation,
            "mode": self.mode,
            "schemas": self.schemas,
            "schema_versions": self.schema_versions,
            "tablespaces": self.tablespaces,
            "dumpfiles": self.dumpfiles,
            "directives": self.directives,
            "as_of": self.as_of,
            "tables": self.tables,
            "constraints": self.constraints,
            "constraint_columns": self.constraint_columns,
            "engine": self.engine,
        }
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JobMetaData":
        from .util import parse_manifest_dt

        return cls(
            job_name=d["job_name"],
            job_owner=d.get("job_owner", ""),
            job_date=parse_manifest_dt(d["job_date"]),
            operation=d["operation"],
            mode=d["mode"],
            schemas=list(d.get("schemas", [])),
            schema_versions=dict(d.get("schema_versions", {})),
            tablespaces=dict(d.get("tablespaces", {})),
            dumpfiles=list(d.get("dumpfiles", [])),
            directives=list(d.get("directives", [])),
            as_of=d.get("as_of"),
            tables=dict(d.get("tables", {})),
            constraints=dict(d.get("constraints", {})),
            constraint_columns=dict(d.get("constraint_columns", {})),
        )
