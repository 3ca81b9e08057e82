"""oracledb-datapump-spark: a PySpark-native bulk ETL engine with the
capabilities of onedatascan/oracledb-datapump, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

The reference (/root/reference) remote-controls Oracle's server-side Data
Pump; this engine owns both the orchestration and the data plane, expressed
Spark-first: partitioned connector reads → DataFrame transforms → Parquet
dump sets, with directives compiling to reader/writer options instead of
PL/SQL calls.
"""

from .base import JobMode, JobState, Operation, Stage
from .client import DataPump
from .directives import Directive, DirectiveBase, PlanConfig, compile_directives
from .exceptions import (
    DataPumpError,
    InvalidDirective,
    InvalidObjectType,
    JobError,
    JobNotFound,
    UsageError,
)
from .job import Job

__version__ = "0.1.0"

__all__ = [
    "DataPump",
    "Directive",
    "DirectiveBase",
    "Job",
    "JobMode",
    "JobState",
    "Operation",
    "PlanConfig",
    "Stage",
    "compile_directives",
    "DataPumpError",
    "InvalidDirective",
    "InvalidObjectType",
    "JobError",
    "JobNotFound",
    "UsageError",
]
