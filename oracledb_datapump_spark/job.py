"""Job facade: lifecycle, naming, manifest.

Parity reference: /root/reference/src/oracledb_datapump/job.py (409 LoC).
Same surface — ``Job(operation, mode, dumpfiles, directives, connection,
tag).run(wait=...)``, ``Job.attach``, ``get_status``, ``poll_for_completion``,
``get_logfile`` — with the Oracle server replaced by the Spark engine.

Lifecycle (reference job.py:195-308 → ours):
  1. resolve connection            (job.py:200-201)  → resolve_connector
  2. validate operation/mode       (job.py:206-210)
  3. stamp job_date → job_name     (job.py:213-218, 88-125)
  4. create log                    (job.py:222-224)  → dump-set event log
  5. open                          (job.py:226-233)  → JOB_OPEN event
  6. collect metadata              (job.py:235-250)  → schemas/versions
  7. plan dump set                 (job.py:252-259)  → plan_export/plan_import
  8. auto FLASHBACK_SCN on EXPORT  (job.py:261-269)  → snapshot_marker()
  9. command pipeline              (job.py:277-286)  → compile + run_plans
 10. wait / status                 (job.py:288-304)
 11. detach                        (job.py:306)      → deregister
"""

from __future__ import annotations

import re
import threading
from typing import Any, Sequence

from pyspark.sql import SparkSession

from .base import JobMetaData, JobMode, JobState, Operation
from .catalog import Connector, resolve_connector
from .directives import (
    DirectiveBase,
    FlashbackScn,
    FlashbackTime,
    PlanConfig,
    compile_directives,
)
from .dumpset import DumpSet
from .engine import EngineResult, run_plans
from .exceptions import JobNotFound, UsageError
from .planner import (
    estimate_plan,
    plan_export,
    plan_import,
    plan_network_transfer,
)
from .session import get_spark
from .status import (
    JobStatusInfo,
    StatusRequestType,
    deregister_job,
    get_status_on_exception,
    live_job,
    poll_for_completion,
    register_job,
    status_from_events,
)
from .util import MAX_IDENTIFIER_LENGTH, string_shortener, utc_now

_NAME_SAFE = re.compile(r"[^A-Za-z0-9_-]+")


class Job:
    """A datapump job (reference job.py:49-81)."""

    def __init__(
        self,
        operation: Operation | str,
        mode: JobMode | str,
        dumpfiles: Sequence[str] | str | None = None,
        directives: Sequence[DirectiveBase] | None = None,
        connection: Any = None,
        tag: str | None = None,
        job_name: str | None = None,
    ):
        self.operation = Operation(str(operation).upper())
        self.mode = JobMode(str(mode).upper())
        if isinstance(dumpfiles, str):
            dumpfiles = [dumpfiles]
        self.dumpfiles = list(dumpfiles or [])
        # IMPORT requires dumpfiles (reference job.py:64-65, re-validated
        # handlers.py:137-139).
        if self.operation == Operation.IMPORT and not self.dumpfiles:
            raise UsageError("IMPORT requires dumpfiles")
        self.directives: list[DirectiveBase] = list(directives or [])
        self.connection = connection
        self.tag = tag
        self.job_date = None
        self.job_name = job_name
        self.job_owner = "spark"
        self._state: JobState = JobState.UNDEFINED
        self._result: EngineResult | None = None
        self._estimates: list[dict[str, Any]] | None = None
        self._lock = threading.Lock()
        self._stop_event = threading.Event()
        self.attached_sessions = 0  # owner run sets 1; attach() adds
        self.dumpset: DumpSet | None = None
        self.connector: Connector | None = None
        self.config: PlanConfig | None = None

    # -- naming (reference job.py:88-125, util.py:16-37) -------------------
    def _ident(self, config: PlanConfig) -> str:
        if config.remap_schema:
            old, new = next(iter(config.remap_schema.items()))
            return f"{old}-TO-{new}"  # reference 'HR-TO-HR2' idiom
        if config.include_schemas:
            return "-".join(config.include_schemas[:3])
        if config.include_tables:
            return "-".join(config.include_tables[:3])
        return self.mode.value
    def _derive_name(self, config: PlanConfig) -> str:
        stamp = self.job_date.strftime("%Y%m%d%H%M%S")
        parts = [self.operation.value[:3], self._ident(config), stamp]
        if self.tag:
            parts.insert(2, f"#{self.tag}#")
        raw = _NAME_SAFE.sub("-", "-".join(parts)).upper()
        return string_shortener(raw, MAX_IDENTIFIER_LENGTH)

    # -- state -------------------------------------------------------------
    @property
    def state(self) -> JobState:
        return self._state

    def _set_state(self, s: JobState) -> None:
        with self._lock:
            self._state = s

    # -- run ----------------------------------------------------------------
    @get_status_on_exception
    def run(
        self,
        wait: bool = True,
        connection: Any = None,
        spark: SparkSession | None = None,
    ) -> JobStatusInfo:
        if connection is not None:
            self.connection = connection
        if self.operation == Operation.SQL_FILE:
            return self._run_sql_file(spark)
        self.job_date = utc_now()
        config = compile_directives(self.directives, mode=self.mode.value)
        self.config = config
        if self.operation == Operation.EXPORT and config.network_link:
            # expdp-side NETWORK_LINK (public Oracle parameter on BOTH
            # utilities): the named link IS the export's source, so no
            # local connection is required — the dump lands locally
            # exactly as if the source were the job connection.
            self.connector = resolve_connector(config.network_link)
        else:
            if self.connection is None:
                raise UsageError("connection required")
            self.connector = resolve_connector(self.connection)
        spark = spark or get_spark()
        if self.job_name is None:
            self.job_name = self._derive_name(config)

        # dump-set root: EXPORT may derive one from the job name; IMPORT
        # must point at an existing set.
        if not self.dumpfiles:
            self.dumpfiles = [f"/tmp/datapump/{self.job_name}"]
        self.dumpset = DumpSet(self.dumpfiles[0])

        # Auto FLASHBACK on EXPORT when absent (reference job.py:261-269):
        # capture the connector's snapshot marker at job open.
        if self.operation == Operation.EXPORT and not (
            config.flashback_scn or config.flashback_time
        ):
            marker = self.connector.snapshot_marker()
            if marker:
                if marker.startswith("SCN("):
                    d = FlashbackScn(int(marker[4:-1]))
                else:
                    from .util import parse_dt

                    d = FlashbackTime(parse_dt(marker[3:-1]))
                self.directives.append(d)
                d.apply(config)

        self._set_state(JobState.DEFINING)
        self.attached_sessions = 1  # the owning run (DBA_DATAPUMP_JOBS)
        register_job(self.job_name, self)
        try:
            return self._run_registered(wait, spark, config)
        except BaseException:
            # A failure anywhere after registration (planning, manifest
            # write, synchronous execution) must not leak the registry
            # entry: attach() would find a permanently DEFINING job and
            # cleanup_orphans would skip its dump dir forever.
            # deregister_job is an idempotent pop, so paths that already
            # deregistered before raising are unaffected.
            deregister_job(self.job_name)
            raise

    def _run_registered(
        self, wait: bool, spark: SparkSession, config: Any
    ) -> JobStatusInfo:
        engine_op = self.operation.value
        if self.operation == Operation.EXPORT:
            plans = plan_export(self.connector, self.operation, self.mode, config)
        elif config.network_link:
            # NETWORK_LINK (public Oracle DP parameter, IMPORT side):
            # plan against the SOURCE catalog, pipe straight to the
            # target — no dump set is materialized; this dumpfiles root
            # holds only the event log and manifest.
            if config.verify_checksum or config.verify_only:
                raise UsageError(
                    "VERIFY_CHECKSUM/VERIFY_ONLY audit a dump set; a "
                    "NETWORK_LINK transfer produces none"
                )
            if config.as_of_version is not None:
                raise UsageError(
                    "AS_OF_VERSION reads dump snapshot history; a "
                    "NETWORK_LINK transfer has no dump — use "
                    "FLASHBACK_SCN/FLASHBACK_TIME against the source"
                )
            if config.encryption:
                raise UsageError(
                    "ENCRYPTION applies to dump files; a NETWORK_LINK "
                    "transfer produces none"
                )
            src = resolve_connector(config.network_link)
            plans = plan_network_transfer(src, self.mode, config)
            for p in plans:
                p.extra["src_connector"] = src
            engine_op = "TRANSFER"
        else:
            plans = plan_import(self.dumpset, config)
        self._thread_plan_extras(plans, config)
        if (
            self.operation == Operation.EXPORT
            and not config.reuse_dumpfiles
            and not config.estimate_only
        ):
            # REUSE_DUMPFILES default NO (Oracle parity: expdp raises
            # ORA-27038 'file already exists' rather than clobbering a
            # dump). Incremental appends are exempt — appending past the
            # watermark is the append contract, not a clobber. So is
            # ESTIMATE_ONLY: Oracle's ESTIMATE_ONLY=YES writes no dump
            # file and performs no clobber check.
            import os as _os

            for p in plans:
                if p.extra.get("incremental_column") is not None:
                    continue
                tdir = self.dumpset.table_dir(p.schema, p.table)
                if _os.path.isdir(tdir) and any(
                    not n.startswith(("_", "."))
                    for _dp, _dn, fn in _os.walk(tdir)
                    for n in fn
                ):
                    deregister_job(self.job_name)
                    raise UsageError(
                        f"dump for {p.source_key} already exists at "
                        f"{tdir} (ORA-27038 analog); set "
                        "REUSE_DUMPFILES('YES') to overwrite it"
                    )
        if not plans:
            # Oracle raises ORA-39165 for a schema that matches nothing; a
            # vacuous job completing silently would hide typos.
            deregister_job(self.job_name)
            raise UsageError(
                f"No tables matched the job specification "
                f"(mode={self.mode.value}, schemas={config.include_schemas}, "
                f"tables={config.include_tables})"
            )

        schemas = sorted({p.schema for p in plans})
        self.dumpset.log_event(
            "JOB_OPEN",
            job_name=self.job_name,
            operation=self.operation.value,
            mode=self.mode.value,
            as_of=config.as_of_marker(),
            parallel=config.parallel,
            schemas=schemas,
        )
        if engine_op == "TRANSFER":
            self.dumpset.log_event(
                "NETWORK_TRANSFER", source=config.network_link
            )
        elif self.operation == Operation.IMPORT:
            # Restart anchor for a dump-set IMPORT (impdp START_JOB
            # parity): the export's manifest describes the DUMP and is
            # never overwritten by an import run, so the import job's own
            # directive list — the input restart() re-compiles — rides
            # the event log instead; the event stream is the master-table
            # analog for both directions. ENCRYPTION_PASSWORD serializes
            # as the redacted sentinel and restart(password=...) must
            # re-supply it, exactly as on the EXPORT side.
            self.dumpset.log_event(
                "IMPORT_JOB_PLAN",
                job_name=self.job_name,
                mode=self.mode.value,
                directives=[d.to_dict() for d in self.directives],
            )

        # metadata sidecar (reference job.py:235-259, commands.py:234-244)
        meta = JobMetaData(
            job_name=self.job_name,
            job_owner=self.job_owner,
            job_date=self.job_date,
            operation=self.operation.value,
            mode=self.mode.value,
            schemas=schemas,
            schema_versions={
                s: v
                for s in schemas
                if (v := self.connector.schema_version(s)) is not None
            },
            tablespaces={s: self.connector.tablespaces(s) for s in schemas},
            directives=[d.to_dict() for d in self.directives],
            as_of=config.as_of_marker(),
            constraints=self._capture_constraints(schemas)
            if self.operation == Operation.EXPORT
            else {},
            constraint_columns=self._capture_constraint_columns(schemas)
            if self.operation == Operation.EXPORT
            else {},
        )

        if config.estimate_only:
            est_connector = (
                plans[0].extra["src_connector"]
                if engine_op == "TRANSFER"
                else self.connector
            )
            self._estimates = estimate_plan(est_connector, plans, spark)
            self.dumpset.log_event("JOB_ESTIMATE", estimates=self._estimates)
            self.dumpset.log_event("JOB_DONE", state=JobState.COMPLETED.value)
            self._set_state(JobState.COMPLETED)
            deregister_job(self.job_name)
            info = self.get_status()
            return info

        if self.operation == Operation.EXPORT and config.include_metadata:
            self.dumpset.write_manifest(meta)

        self.dumpset.log_event("JOB_START")
        self._set_state(JobState.EXECUTING)
        # Completion handle for kill(): the async path joins _worker, but
        # a synchronous run(wait=True) has no thread object to join — a
        # kill() from another thread must still wait for the executing
        # thread to reach a boundary before deleting the dump set, or the
        # in-flight table's event/manifest writes resurrect the deleted
        # directory as a half-dump.
        self._done_event = threading.Event()

        def _execute() -> None:
            try:
                _execute_core()
            finally:
                self._done_event.set()

        def _execute_core() -> None:
            result = run_plans(
                spark, self.connector, self.dumpset, plans, config,
                engine_op, stop_event=self._stop_event,
            )
            self._result = result
            self._set_state(
                JobState.STOPPING
                if result.state == JobState.STOPPED
                else JobState.COMPLETING
            )

            if self.operation == Operation.EXPORT or engine_op == "TRANSFER":
                # enrich manifest with per-table outcomes; not-run tables
                # (cooperative STOP before their boundary) stay out — the
                # manifest describes what the dump set actually holds,
                # and restart() re-plans the remainder from directives
                for r in result.tables:
                    if r.detail.get("not_run"):
                        continue
                    meta.tables[r.plan.source_key] = {
                        "rows": None if not r.ok else r.rows,
                        "row_count": r.rows,
                        "bytes": r.bytes,
                        "files": r.files,
                        "ok": r.ok,
                        **r.detail,
                    }
                meta.dumpfiles = [
                    p.replace(self.dumpset.root + "/", "")
                    for p in self.dumpset.dumpfiles()
                ]
                if config.include_metadata:
                    self.dumpset.write_manifest(meta)

            self.dumpset.log_event(
                "JOB_DONE",
                state=result.state.value,
                dumpfiles=self.dumpset.dumpfiles()
                if self.operation == Operation.EXPORT
                else [],
                errors=result.error_count,
            )
            self._set_state(result.state)

            # POST stage (reference job.py:288-295: Extra directives only
            # when wait=True — DELETE_FILES after synchronous import)
            if (
                wait
                and self.operation == Operation.IMPORT
                and config.delete_files_after
                and result.state == JobState.COMPLETED
            ):
                self.dumpset.delete()

            deregister_job(self.job_name)

        if wait:
            _execute()
            return self.get_status()

        # async mode (reference job.py:297-304): the job keeps running —
        # driver-side worker thread replaces Oracle's server-side workers;
        # the caller observes via attach/get_status/poll_for_completion,
        # and the registry entry stays live until _execute finishes.
        def _execute_guarded() -> None:
            try:
                _execute()
            except Exception as e:  # surfaced via status, like the server
                self.dumpset.log_event("JOB_ERROR", error=str(e))
                self.dumpset.log_event("JOB_DONE", state=JobState.ERROR.value)
                self._set_state(JobState.ERROR)
                deregister_job(self.job_name)

        t = threading.Thread(
            target=_execute_guarded, name=f"datapump-{self.job_name}", daemon=True
        )
        self._worker = t
        t.start()
        return self.get_status()

    def _thread_plan_extras(self, plans: list, config: Any) -> None:
        """Thread directive-derived per-plan extras (shared by run and
        restart, which re-plans from the manifest's directive list).

        ENCRYPTION: validate the directive family once at plan time
        (wallet modes and DDL column scopes fail loudly here), then
        thread the normalized contract into each plan — the password
        rides plan.extra in memory only and never reaches the manifest
        (engine records scope/algorithm/salt, not the secret).
        CHECKSUM (Oracle DP 21c): thread the algorithm into each export
        plan; the engine records per-file digests post-write.
        INCREMENTAL_COLUMN: thread each table's recorded watermark from
        the prior manifest so the engine exports only new rows, appended.
        """
        if config.encryption:
            from .crypto import validate_encryption

            enc = validate_encryption(config.encryption)
            if enc and self.operation == Operation.EXPORT:
                for p in plans:
                    p.extra["encryption"] = enc
            elif enc:
                for p in plans:
                    p.extra["encryption_password"] = enc["password"]
        if config.checksum and self.operation == Operation.EXPORT:
            for p in plans:
                p.extra["checksum_algorithm"] = config.checksum_algorithm
        if config.filesize and self.operation == Operation.EXPORT:
            if config.encryption:
                # the encrypted writer owns its file layout (one sealed
                # file per mapInPandas partition); a records-per-file cap
                # on top would silently not be honored
                raise UsageError(
                    "FILESIZE cannot be combined with ENCRYPTION: the "
                    "encrypted writer controls its own file layout"
                )
            for p in plans:
                p.extra["filesize_bytes"] = config.filesize
        if (
            config.table_dedup_keep_best
            and config.incremental_columns
            and self.operation == Operation.EXPORT
        ):
            # DEDUP_KEEP_BEST promises exactly one row per key in the
            # exported dump; an incremental append runs the keep-best
            # window only over the post-watermark slice, so a key already
            # dumped in a prior increment could gain a second row. Refuse
            # the composition loudly (same posture as the
            # ENCRYPTION×INCREMENTAL guard in engine.export_table).
            raise UsageError(
                "DEDUP_KEEP_BEST cannot be combined with "
                "INCREMENTAL_COLUMN: the keep-best window sees only the "
                "post-watermark slice, so appended survivors could "
                "duplicate keys already in the dump and break the "
                "one-row-per-key contract"
            )
        if config.incremental_columns and self.operation == Operation.EXPORT:
            prior = self.dumpset.read_manifest().tables if self.dumpset.exists() else {}
            for p in plans:
                col = config.incremental_columns.get(
                    p.table, config.incremental_columns.get("*")
                )
                if col:
                    p.extra["incremental_column"] = col
                    p.extra["watermark"] = prior.get(p.source_key, {}).get(
                        "watermark"
                    )
                    # carry the snapshot history forward so the append
                    # run's manifest keeps every prior version readable
                    # via AS_OF_VERSION
                    p.extra["snapshots"] = prior.get(p.source_key, {}).get(
                        "snapshots"
                    )

    def _capture_constraints(self, schemas: list[str]) -> dict[str, list[str]]:
        """FK adjacency per schema (connector introspection) → manifest, so
        import can topo-order parents before children."""
        out: dict[str, list[str]] = {}
        for s in schemas:
            try:
                for table, ref in self.connector.foreign_keys(s):
                    out.setdefault(f"{s}.{table}", []).append(f"{s}.{ref}")
            except Exception:  # constraint capture must not fail the job
                pass
        return out

    def _capture_constraint_columns(
        self, schemas: list[str]
    ) -> dict[str, dict]:
        """Column-level PRIMARY KEY / FOREIGN KEY metadata → manifest
        (SQL_FILE renders it as constraint DDL). Optional per connector:
        file sources have no catalog keys and contribute nothing."""
        out: dict[str, dict] = {}
        for s in schemas:
            try:
                cc = getattr(self.connector, "constraint_columns", None)
                if cc is None:
                    continue
                for table, keys in cc(s).items():
                    out[f"{s}.{table}"] = keys
            except Exception:  # constraint capture must not fail the job
                pass
        return out

    def _run_sql_file(self, spark: SparkSession | None) -> JobStatusInfo:
        """SQL_FILE: generate a DDL script from a dump set's captured
        schemas. The reference declares this operation but never implements
        it (files.py:899-900 raises NotImplementedError); we implement it
        as CREATE TABLE generation from the manifest's StructType JSON."""
        from .ddl import generate_sql_file

        if not self.dumpfiles:
            raise UsageError("SQL_FILE requires dumpfiles (a dump-set dir)")
        self.dumpset = DumpSet(self.dumpfiles[0])
        self.job_date = utc_now()
        config = compile_directives(self.directives, mode=self.mode.value)
        self.config = config
        if self.job_name is None:
            self.job_name = self._derive_name(config)
        path = generate_sql_file(self.dumpset, config)
        self.dumpset.log_event("SQL_FILE_DONE", path=path)
        self.dumpset.log_event("JOB_DONE", state=JobState.COMPLETED.value)
        self._set_state(JobState.COMPLETED)
        return self.get_status()

    # -- status (reference job.py:359-409) ---------------------------------
    def get_status(
        self, request: StatusRequestType = StatusRequestType.ALL
    ) -> JobStatusInfo:
        if self.dumpset is None:
            return JobStatusInfo(job_state=self._state.value)
        info = status_from_events(self.dumpset, request)
        # An ATTACHED job's in-memory state is a snapshot from attach
        # time; the process actually running the job advances the EVENT
        # LOG. When the log shows a terminal state the snapshot hasn't
        # reached, adopt it — otherwise poll_for_completion (which reads
        # self._state) spins forever on a job another process finished.
        if self.connector is None and getattr(self, "_worker", None) is None:
            from .base import TERMINAL_STATES

            try:
                ev = JobState(info.job_state)
            except ValueError:
                ev = None
            if (
                ev is not None
                and ev in TERMINAL_STATES
                and self._state not in TERMINAL_STATES
            ):
                self._state = ev
        if self._state != JobState.UNDEFINED:
            info.job_state = self._state.value
        return info

    def get_info(self) -> JobStatusInfo:
        return self.get_status(StatusRequestType.ALL)

    def poll_for_completion(self, rate: float = 30) -> JobStatusInfo:
        poll_for_completion(lambda: self._state.value, rate=rate)
        return self.get_status()

    def get_logfile(self) -> str:
        if self.dumpset is None:
            return ""
        return self.dumpset.read_logfile()

    def log_entry(self, message: str) -> None:
        """Inject a custom line into the job log (reference C8:
        DBMS_DATAPUMP.LOG_ENTRY — commands.py:217-231)."""
        if self.dumpset is None:
            raise UsageError("Job has no dump set yet (not started)")
        self.dumpset.log_event("LOG_ENTRY", message=message)

    @property
    def estimates(self) -> list[dict[str, Any]] | None:
        return self._estimates

    # -- stop / restart (Oracle STOP_JOB → START_JOB; reference declares
    # the state machine at status.py:32-47 and the START_JOB command at
    # commands.py:113-119 but never drives them locally) ------------------
    def stop(self) -> JobStatusInfo:
        """STOP_JOB analog: request a cooperative stop at the next table
        boundary. In-flight tables complete (a table is the atomic unit of
        restartability); not-yet-started tables are recorded as not-run
        and the job lands in STOPPED — restartable via ``restart()``.

        State walk mirrors the reference's machine (status.py:32-47):
        EXECUTING → STOP_PENDING (this call) → STOPPING (engine
        acknowledges at the first skipped boundary) → STOPPED (JOB_DONE).
        """
        from .base import TERMINAL_STATES

        if self._state in TERMINAL_STATES or self._state in (
            JobState.UNDEFINED,
            JobState.NOT_RUNNING,
        ):
            raise UsageError(
                f"Job {self.job_name!r} is not running "
                f"(state={self._state.value}); only a DEFINING/EXECUTING "
                "job can be stopped"
            )
        self._stop_event.set()
        self._set_state(JobState.STOP_PENDING)
        if self.dumpset is not None:
            self.dumpset.log_event(
                "JOB_STOP_PENDING", job_name=self.job_name
            )
        return self.get_status()

    def kill(self, timeout: float = 600.0) -> None:
        """KILL_JOB analog (Oracle's interactive-mode command /
        DBMS_DATAPUMP.STOP_JOB with immediate stop and the master table
        dropped): request a cooperative stop, wait for the worker to
        land terminal, then DELETE the entire dump set — data files,
        manifest and event log (Oracle drops the master table, so a
        killed job is not attachable and not restartable; files written
        so far are discarded). Contrast stop(): STOPPED keeps every
        artifact and restart() resumes from them."""
        from .base import TERMINAL_STATES

        if self.dumpset is None:
            raise UsageError("Job has no dump set yet (not started)")
        if self._state not in TERMINAL_STATES and self._state not in (
            JobState.UNDEFINED,
            JobState.NOT_RUNNING,
        ):
            self._stop_event.set()
            self._set_state(JobState.STOP_PENDING)
            worker = getattr(self, "_worker", None)
            if worker is not None and worker.is_alive():
                worker.join(timeout=timeout)
                if worker.is_alive():
                    raise UsageError(
                        f"kill(): worker did not reach a table boundary "
                        f"within {timeout}s; the job is still stopping"
                    )
            elif worker is None:
                # synchronous run(wait=True) stopped from another thread:
                # no thread object to join, but _done_event marks the
                # executing thread reaching its boundary — deleting the
                # dump set before that lets in-flight event/manifest
                # writes recreate the directory as a half-resurrected dump
                done = getattr(self, "_done_event", None)
                if done is not None and not done.wait(timeout=timeout):
                    raise UsageError(
                        f"kill(): executing thread did not reach a table "
                        f"boundary within {timeout}s; the job is still "
                        "stopping"
                    )
        self.dumpset.delete()
        deregister_job(self.job_name)
        self._set_state(JobState.NOT_RUNNING)

    def restart(
        self,
        connection: Any = None,
        spark: SparkSession | None = None,
        password: str | None = None,
    ) -> JobStatusInfo:
        """START_JOB analog: resume a STOPPED export from its manifest —
        the dump set's manifest/event log plays Oracle's master table.

        Re-plans the ORIGINAL job from the manifest's recorded directive
        list (so FLASHBACK/as-of, CHECKSUM, COMPRESSION, filters and
        remaps are all re-applied verbatim), then skips every table whose
        dump is already complete: manifest entry ok, data files present,
        and — when CHECKSUM digests were recorded — the recomputed
        per-file digests match (a tampered or truncated table is
        re-exported, TABLE_RESUME_RECHECK_FAILED). Only the remaining
        tables run; the manifest is merged, never rebuilt, so completed
        tables keep their original entries byte-for-byte.

        NETWORK_LINK transfers (IMPORT + link) are restartable too: there
        is no dump to digest, so completeness is verified against the
        TARGET — each completed table recorded a row count + content
        fingerprint (engine.table_fingerprint) at TABLE_TRANSFER_DONE,
        and restart() recomputes both before skipping; a dropped or
        tampered target is re-transferred with write_mode forced to
        overwrite.

        Dump-set IMPORT jobs (impdp ATTACH/START_JOB) resume the same
        way: the export's manifest describes the DUMP and is never
        overwritten by an import run, so the import job re-plans from
        the IMPORT_JOB_PLAN event's directive list and verifies each
        completed table against the TARGET fingerprint recorded at
        TABLE_IMPORT_DONE (target_rows + target_digest) — verified
        targets are skipped wholesale, a dropped/tampered target is
        re-imported with write_mode forced to overwrite, and only
        not-run tables execute. A stopped import from before the
        fingerprints were recorded falls back to the idempotent
        TABLE_EXISTS_ACTION('SKIP') re-run, loudly.
        """
        if self.dumpset is None:
            raise UsageError("restart requires a job with a dump set")
        info = status_from_events(self.dumpset)
        if (
            self._state != JobState.STOPPED
            and info.job_state != JobState.STOPPED.value
        ):
            raise UsageError(
                f"Only a STOPPED job can restart (START_JOB); "
                f"state={self._state.value}/{info.job_state}"
            )
        # Which job is being resumed? The LAST JOB_OPEN event names it.
        # A dump-set IMPORT leaves the export's manifest untouched, so
        # its restart anchor is the IMPORT_JOB_PLAN event (directive
        # list) rather than the manifest; EXPORT and TRANSFER jobs keep
        # resuming from the manifest exactly as before.
        events = list(self.dumpset.read_events())
        last_open = max(
            (
                i
                for i, e in enumerate(events)
                if e.get("event") == "JOB_OPEN"
            ),
            default=None,
        )
        import_plan_ev = None
        if (
            last_open is not None
            and events[last_open].get("operation") == Operation.IMPORT.value
        ):
            import_plan_ev = next(
                (
                    e
                    for e in events[last_open:]
                    if e.get("event") == "IMPORT_JOB_PLAN"
                ),
                None,
            )
        if connection is not None:
            self.connection = connection
        spark = spark or get_spark()
        self.job_date = utc_now()
        meta = None
        if import_plan_ev is not None:
            self.operation = Operation.IMPORT
            self.mode = JobMode(import_plan_ev["mode"])
            self.job_name = import_plan_ev.get("job_name", self.job_name)
            self.directives = [
                DirectiveBase.from_dict(d)
                for d in import_plan_ev["directives"]
            ]
        else:
            meta = self.dumpset.read_manifest()
            self.operation = Operation(meta.operation)
            self.mode = JobMode(meta.mode)
            self.job_name = meta.job_name
            self.directives = [
                DirectiveBase.from_dict(d) for d in meta.directives
            ]
        # ENCRYPTION_PASSWORD persists as the redacted '***' sentinel
        # (never the secret) — re-planning from the manifest verbatim
        # would seal every remaining table under a key derived from a
        # public constant. The caller must re-supply the original
        # password, exactly as Oracle's START_JOB re-prompts for it.
        enc_pw = [
            d for d in self.directives
            if getattr(d, "NAME", None) == "ENCRYPTION_PASSWORD"
        ]
        if enc_pw:
            if not password or password == "***":
                raise UsageError(
                    "this job was exported with ENCRYPTION_PASSWORD; the "
                    "manifest stores only the redacted sentinel, so "
                    "restart() requires the original password: "
                    "restart(password=...)"
                )
            for d in enc_pw:
                d.value = password
        elif password is not None:
            raise UsageError(
                "restart(password=...) supplied but the stopped job has "
                "no ENCRYPTION_PASSWORD directive"
            )
        config = compile_directives(self.directives, mode=self.mode.value)
        is_import = import_plan_ev is not None
        is_transfer = (
            self.operation == Operation.IMPORT
            and bool(config.network_link)
            and not is_import
        )
        if (
            self.operation != Operation.EXPORT
            and not is_transfer
            and not is_import
        ):
            raise UsageError(
                "restart() supports EXPORT, NETWORK_LINK transfer and "
                "dump-set IMPORT jobs; this stopped import predates the "
                "IMPORT_JOB_PLAN restart anchor — re-run it with "
                "TABLE_EXISTS_ACTION('SKIP') for resume-equivalent "
                "semantics"
            )
        src = None
        if is_import:
            if self.connection is None:
                raise UsageError(
                    "connection (the import TARGET) required to restart "
                    "a dump-set IMPORT"
                )
            self.connector = resolve_connector(self.connection)
        elif is_transfer:
            # impdp-side NETWORK_LINK: the link names the SOURCE; the
            # connection is the transfer TARGET, exactly as the original
            # run — both re-resolve from the manifest's directive list
            if self.connection is None:
                raise UsageError(
                    "connection (the transfer TARGET) required to "
                    "restart a NETWORK_LINK transfer"
                )
            self.connector = resolve_connector(self.connection)
            src = resolve_connector(config.network_link)
        elif config.network_link:
            # expdp-side NETWORK_LINK rides the manifest's directive
            # list, so the resumed export re-resolves its source from
            # the link — no connection needed, same as the original run
            self.connector = resolve_connector(config.network_link)
        elif self.connection is None:
            raise UsageError("connection required to restart")
        else:
            self.connector = resolve_connector(self.connection)
        self.config = config
        if is_transfer:
            plans = plan_network_transfer(src, self.mode, config)
            for p in plans:
                p.extra["src_connector"] = src
            engine_op = "TRANSFER"
        elif is_import:
            plans = plan_import(self.dumpset, config)
            engine_op = "IMPORT"
        else:
            plans = plan_export(
                self.connector, self.operation, self.mode, config
            )
            engine_op = self.operation.value
        self._thread_plan_extras(plans, config)
        # Completed-table record: manifest entries for EXPORT/TRANSFER;
        # for a dump-set IMPORT the TABLE_IMPORT_DONE events since the
        # last JOB_OPEN (target fingerprints) play that role — earlier
        # unrelated import runs on the same dump set stay out of scope.
        import_done: dict[str, dict] = {}
        if is_import:
            for ev in events[last_open:]:
                if (
                    ev.get("event") == "TABLE_IMPORT_DONE"
                    and ev.get("target_digest") is not None
                ):
                    import_done[ev.get("table", "")] = {
                        "ok": True,
                        "row_count": ev.get("target_rows"),
                        "target_digest": ev.get("target_digest"),
                    }
        remaining, skipped = [], []
        for p in plans:
            entry = (
                import_done.get(p.target_key)
                if is_import
                else meta.tables.get(p.source_key)
            )
            if (
                entry
                and entry.get("ok")
                and (
                    self._transfer_intact(spark, p, entry)
                    if is_transfer or is_import
                    else self._resume_intact(spark, p, entry)
                )
            ):
                skipped.append(p)
            else:
                if (is_transfer or is_import) and entry and entry.get("ok"):
                    # recheck failed on a recorded-complete table: the
                    # target holds a tampered/partial remnant, so the
                    # re-run must replace it, never append onto it
                    p.write_mode, p.truncate = "overwrite", False
                remaining.append(p)
        # event identity: IMPORT/TRANSFER completion rows
        # (TABLE_IMPORT_DONE / TABLE_TRANSFER_DONE) describe the TARGET,
        # so their resume events must carry the same (remapped) key —
        # Oracle's master table names the remapped object on import.
        # EXPORT resumes keep the source key (the dump IS the source).
        _k = (
            (lambda p: p.target_key)
            if (is_transfer or is_import)
            else (lambda p: p.source_key)
        )
        self.dumpset.log_event(
            "JOB_RESTART",
            job_name=self.job_name,
            skipped=[_k(p) for p in skipped],
            remaining=[_k(p) for p in remaining],
        )
        for p in skipped:
            self.dumpset.log_event("TABLE_RESUME_SKIP", table=_k(p))
        self._stop_event = threading.Event()  # restart is itself stoppable
        self._done_event = threading.Event()  # kill() boundary handle
        self._set_state(JobState.EXECUTING)
        self.attached_sessions = 1  # the resuming run re-owns the job
        register_job(self.job_name, self)
        try:
            result = (
                run_plans(
                    spark, self.connector, self.dumpset, remaining, config,
                    engine_op, stop_event=self._stop_event,
                )
                if remaining
                else EngineResult(state=JobState.COMPLETED)
            )
            self._result = result
            if not is_import:
                # EXPORT/TRANSFER enrich the manifest; a resumed IMPORT
                # leaves the export's manifest untouched (it describes
                # the dump) — its completion record is the event log.
                for r in result.tables:
                    if r.detail.get("not_run"):
                        continue
                    meta.tables[r.plan.source_key] = {
                        "rows": None if not r.ok else r.rows,
                        "row_count": r.rows,
                        "bytes": r.bytes,
                        "files": r.files,
                        "ok": r.ok,
                        **r.detail,
                    }
                meta.dumpfiles = [
                    p.replace(self.dumpset.root + "/", "")
                    for p in self.dumpset.dumpfiles()
                ]
                if config.include_metadata:
                    self.dumpset.write_manifest(meta)
            self.dumpset.log_event(
                "JOB_DONE",
                state=result.state.value,
                dumpfiles=[] if is_import else self.dumpset.dumpfiles(),
                errors=result.error_count,
            )
            self._set_state(result.state)
            if (
                is_import
                and config.delete_files_after
                and result.state == JobState.COMPLETED
            ):
                # POST stage carried over from the stopped run: the
                # original DELETE_FILES never fired (the job stopped),
                # so the resumed completion honors it.
                self.dumpset.delete()
            return self.get_status()
        finally:
            self._done_event.set()
            deregister_job(self.job_name)

    def _resume_intact(self, spark: SparkSession, plan, entry: dict) -> bool:
        """Is a manifest-complete table's dump physically intact? Files
        must exist; when the original run recorded CHECKSUM digests they
        are recomputed (executor fan-out, same as VERIFY_CHECKSUM) and
        compared — the digest map is the proof of completeness, so a
        tampered file forces a re-export rather than a silent skip."""
        import os

        tdir = self.dumpset.table_dir(plan.schema, plan.table)
        n_files = 0
        for dirpath, dirnames, filenames in os.walk(tdir):
            dirnames[:] = [
                d for d in dirnames if not d.startswith(("_", "."))
            ]
            n_files += sum(
                1 for f in filenames if not f.startswith(("_", "."))
            )
        if n_files == 0:
            self.dumpset.log_event(
                "TABLE_RESUME_RECHECK_FAILED",
                table=plan.source_key,
                reason="no data files on disk",
            )
            return False
        cks = entry.get("checksums")
        if cks:
            fresh = self.dumpset.file_digests(
                spark, tdir, cks.get("algorithm", "SHA256")
            )
            if fresh != cks.get("files"):
                self.dumpset.log_event(
                    "TABLE_RESUME_RECHECK_FAILED",
                    table=plan.source_key,
                    reason="checksum mismatch",
                )
                return False
        elif entry.get("files") and n_files != entry["files"]:
            self.dumpset.log_event(
                "TABLE_RESUME_RECHECK_FAILED",
                table=plan.source_key,
                reason=f"file count {n_files} != recorded {entry['files']}",
            )
            return False
        return True

    def _transfer_intact(self, spark: SparkSession, plan, entry: dict) -> bool:
        """Transfer-resume analog of _resume_intact: a NETWORK_LINK job
        has no dump to digest, so completeness is verified against the
        TARGET — the table must exist and its recomputed fingerprint
        (row count + xxhash64-XOR content digest, engine.table_fingerprint)
        must equal the values recorded at TABLE_TRANSFER_DONE. One
        distributed scan per completed table, the same cost class as the
        export path's digest recheck."""
        from .engine import table_fingerprint

        if not self.connector.table_exists(
            plan.target_schema, plan.target_table
        ):
            self.dumpset.log_event(
                "TABLE_RESUME_RECHECK_FAILED",
                table=plan.target_key,
                reason="target table missing",
            )
            return False
        try:
            rows, digest = table_fingerprint(
                self.connector.read_table(
                    spark, plan.target_schema, plan.target_table
                )
            )
        except Exception as e:
            # an unreadable target (all data files gone, corrupt footer)
            # is the strongest possible "not intact" — re-transfer it
            self.dumpset.log_event(
                "TABLE_RESUME_RECHECK_FAILED",
                table=plan.target_key,
                reason=f"target unreadable: {e}",
            )
            return False
        if rows != entry.get("row_count"):
            self.dumpset.log_event(
                "TABLE_RESUME_RECHECK_FAILED",
                table=plan.target_key,
                reason=f"target rows {rows} != recorded {entry.get('row_count')}",
            )
            return False
        want = entry.get("target_digest")
        if want is not None and digest != want:
            self.dumpset.log_event(
                "TABLE_RESUME_RECHECK_FAILED",
                table=plan.target_key,
                reason="target content digest mismatch",
            )
            return False
        return True

    # -- attach (reference job.py:330-349, commands.py:69-89) --------------
    @classmethod
    def attach(cls, job_name: str, dumpdir: str | None = None) -> "Job":
        existing = live_job(job_name)
        if isinstance(existing, Job):
            # DBA_DATAPUMP_JOBS attached_sessions analog: each live
            # attach handle counts alongside the owning run
            existing.attached_sessions = (
                getattr(existing, "attached_sessions", 1) + 1
            )
            return existing
        if dumpdir is None:
            raise JobNotFound(
                f"Job {job_name!r} is not running; pass dumpdir to attach to "
                "its dump set"
            )
        ds = DumpSet(dumpdir)
        if not ds.exists() and not list(ds.read_events()):
            raise JobNotFound(f"No job artifacts at {dumpdir}")
        job = cls.__new__(cls)
        job.operation = Operation.EXPORT
        job.mode = JobMode.SCHEMA
        job.dumpfiles = [dumpdir]
        job.directives = []
        job.connection = None
        job.tag = None
        job.job_name = job_name
        job.job_owner = "spark"
        job.job_date = None
        job._state = JobState.NOT_RUNNING
        job.attached_sessions = 1  # this attach handle
        job._result = None
        job._estimates = None
        job._lock = threading.Lock()
        job._stop_event = threading.Event()
        job.dumpset = ds
        job.connector = None
        job.config = None
        info = status_from_events(ds)
        try:
            job._state = JobState(info.job_state)
        except ValueError:
            pass
        if ds.exists():
            m = ds.read_manifest()
            job.operation = Operation(m.operation)
            job.mode = JobMode(m.mode)
        return job
