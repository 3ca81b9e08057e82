"""JSON request/response protocol.

Parity reference: /root/reference/src/oracledb_datapump/request.py (279
LoC): a ``Request`` envelope with request ∈ {SUBMIT, STATUS, POLL}, a typed
payload, a handler registry keyed by request type (:112-124), and a
``Response`` echoing job name/state (:246-273). Implemented with plain
dataclasses + explicit validation (no pydantic dependency); the JSON wire
shapes match the reference's.

Directive JSON form (reference request.py:31-51):
    {"name": N, "value": V, "old_value"?, "object_path"?, "kwargs"?}
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, ClassVar

from .base import JobMode, Operation
from .directives import DirectiveBase
from .exceptions import JobNotFound, UsageError
from .job import Job
from .status import JobStatusInfo, StatusRequestType


@dataclass
class ConnectModel:
    """Connection spec in a request (reference request.py:54-59; password
    treated as a secret — never echoed)."""

    url: str | None = None
    user: str | None = None
    password: str | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_obj(cls, obj: Any) -> "ConnectModel":
        if isinstance(obj, str):
            return cls(url=obj)
        if isinstance(obj, dict):
            known = {k: obj.get(k) for k in ("url", "user", "password")}
            extra = {k: v for k, v in obj.items() if k not in known}
            return cls(**known, extra=extra)
        raise UsageError(f"Bad connection spec: {type(obj).__name__}")

    def to_connection(self) -> Any:
        if self.url and not (self.user or self.password or self.extra):
            return self.url
        d: dict[str, Any] = {"url": self.url, **self.extra}
        if self.user:
            d["user"] = self.user
        if self.password:
            d["password"] = self.password
        return d


@dataclass
class Response:
    """Reference request.py:127-137,246-273."""

    request: str
    job_name: str | None = None
    job_owner: str | None = None
    state: str | None = None
    detail: JobStatusInfo | None = None
    error: str | None = None
    jobs: list[dict[str, Any]] | None = None  # LIST_JOBS rows

    def to_dict(self) -> dict[str, Any]:
        d = {
            "request": self.request,
            "job_name": self.job_name,
            "job_owner": self.job_owner,
            "state": self.state,
            "detail": self.detail.to_dict() if self.detail else None,
            "error": self.error,
        }
        if self.jobs is not None:
            d["jobs"] = self.jobs
        return d

    def json(self) -> str:
        return json.dumps(self.to_dict(), default=str)


class RequestHandler:
    """Registry-dispatched handlers (reference request.py:112-124)."""

    registry: ClassVar[dict[str, type["RequestHandler"]]] = {}
    REQUEST_TYPE: ClassVar[str] = ""

    def __init_subclass__(cls, request_type: str | None = None, **kw):
        super().__init_subclass__(**kw)
        if request_type:
            cls.REQUEST_TYPE = request_type
            RequestHandler.registry[request_type] = cls

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        raise NotImplementedError

    @staticmethod
    def parse_directives(items: list[dict[str, Any]]) -> list[DirectiveBase]:
        """Directive dicts → instances via the registry
        (reference request.py:160-169)."""
        return [DirectiveBase.from_dict(d) for d in items or []]


class SubmitHandler(RequestHandler, request_type="SUBMIT"):
    """Reference JobRequestHandler (request.py:150-183)."""

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        op = payload.get("operation")
        mode = payload.get("mode")
        if not op or not mode:
            raise UsageError("SUBMIT payload requires operation and mode")
        job = Job(
            operation=Operation(str(op).upper()),
            mode=JobMode(str(mode).upper()),
            dumpfiles=payload.get("dumpfiles"),
            directives=self.parse_directives(payload.get("directives", [])),
            tag=payload.get("tag"),
            job_name=payload.get("job_name"),
        )
        info = job.run(
            wait=bool(payload.get("wait", False)), connection=connection, spark=spark
        )
        return Response(
            request="SUBMIT",
            job_name=job.job_name,
            job_owner=job.job_owner,
            state=info.job_state,
            detail=info,
        )


class StatusHandler(RequestHandler, request_type="STATUS"):
    """Reference JobStatusHandler (request.py:186-222)."""

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        job_name = payload.get("job_name")
        dumpdir = payload.get("dumpdir") or (payload.get("dumpfiles") or [None])[0]
        if not job_name:
            raise UsageError("STATUS payload requires job_name")
        job = Job.attach(job_name, dumpdir=dumpdir)
        rt = payload.get("request_type")
        request = (
            StatusRequestType[rt.upper()] if rt else StatusRequestType.ALL
        )
        info = job.get_status(request)
        return Response(
            request="STATUS",
            job_name=job_name,
            job_owner=job.job_owner,
            state=info.job_state,
            detail=info,
        )


class PollHandler(RequestHandler, request_type="POLL"):
    """Reference PollRequestHandler (request.py:225-243)."""

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        job_name = payload.get("job_name")
        dumpdir = payload.get("dumpdir") or (payload.get("dumpfiles") or [None])[0]
        if not job_name:
            raise UsageError("POLL payload requires job_name")
        job = Job.attach(job_name, dumpdir=dumpdir)
        info = job.poll_for_completion(rate=float(payload.get("rate", 30)))
        return Response(
            request="POLL",
            job_name=job_name,
            job_owner=job.job_owner,
            state=info.job_state,
            detail=info,
        )


class StopHandler(RequestHandler, request_type="STOP"):
    """STOP_JOB over the JSON protocol (public DBMS_DATAPUMP.STOP_JOB —
    the reference's request surface stops at SUBMIT/STATUS/POLL).
    Cooperative table-boundary stop; the response reports the state at
    request time (STOP_PENDING/STOPPING) — poll for STOPPED."""

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        job_name = payload.get("job_name")
        if not job_name:
            raise UsageError("STOP payload requires job_name")
        job = Job.attach(job_name)  # live jobs only: a done job can't stop
        info = job.stop()
        return Response(
            request="STOP",
            job_name=job_name,
            job_owner=job.job_owner,
            state=info.job_state,
            detail=info,
        )


class RestartHandler(RequestHandler, request_type="RESTART"):
    """START_JOB over the JSON protocol (public DBMS_DATAPUMP START_JOB:
    resume a STOPPED job from its master table — here, the dump-set
    manifest). Synchronous: responds when the resumed job lands."""

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        job_name = payload.get("job_name")
        dumpdir = payload.get("dumpdir") or (payload.get("dumpfiles") or [None])[0]
        if not job_name:
            raise UsageError("RESTART payload requires job_name")
        job = Job.attach(job_name, dumpdir=dumpdir)
        # encrypted jobs: the manifest holds only the redacted '***'
        # sentinel, so the caller re-supplies the password here — the
        # protocol analog of START_JOB re-prompting for it
        info = job.restart(
            connection=connection,
            spark=spark,
            password=payload.get("encryption_password"),
        )
        return Response(
            request="RESTART",
            job_name=job_name,
            job_owner=job.job_owner,
            state=info.job_state,
            detail=info,
        )


class ListJobsHandler(RequestHandler, request_type="LIST_JOBS"):
    """DBA_DATAPUMP_JOBS over the JSON protocol: enumerate the live-job
    registry plus (optionally) every dump set under ``dump_root``, with
    operation/mode from the manifest and state replayed from the event
    log (reference status.py:366-385 reads the Oracle view; here the
    dump-set directory IS the master-table store)."""

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        from .status import list_jobs

        rows = list_jobs(dump_root=payload.get("dump_root"))
        return Response(request="LIST_JOBS", jobs=rows)


class KillHandler(RequestHandler, request_type="KILL"):
    """KILL_JOB over the JSON protocol: stop + delete the whole dump
    set (master table dropped — not attachable, not restartable)."""

    def handle(self, payload: dict[str, Any], connection: Any, spark=None) -> Response:
        job_name = payload.get("job_name")
        dumpdir = payload.get("dumpdir") or (payload.get("dumpfiles") or [None])[0]
        if not job_name:
            raise UsageError("KILL payload requires job_name")
        job = Job.attach(job_name, dumpdir=dumpdir)
        job.kill()
        return Response(
            request="KILL",
            job_name=job_name,
            job_owner=job.job_owner,
            state=job.state.value,
        )


def handle_request(request: str | dict[str, Any], spark=None) -> Response:
    """Entry point: JSON string or dict → dispatch → Response
    (reference DataPump.submit, client.py:21-27; payload-type consistency
    validated like request.py:95-109)."""
    if isinstance(request, str):
        try:
            request = json.loads(request)
        except json.JSONDecodeError as e:
            raise UsageError(f"Bad request JSON: {e}") from e
    if not isinstance(request, dict):
        raise UsageError("Request must be a JSON object")
    rtype = str(request.get("request", "")).upper()
    handler_cls = RequestHandler.registry.get(rtype)
    if handler_cls is None:
        raise UsageError(
            f"Unknown request type {rtype!r}; expected one of "
            f"{sorted(RequestHandler.registry)}"
        )
    payload = request.get("payload") or {}
    conn_obj = request.get("connection")
    connection = (
        ConnectModel.from_obj(conn_obj).to_connection() if conn_obj else None
    )
    try:
        return handler_cls().handle(payload, connection, spark=spark)
    except (UsageError, JobNotFound):
        raise  # caller-addressable errors propagate (HTTP 400/404)
    except Exception as e:
        return Response(request=rtype, state="ERROR", error=str(e))


# convenience callable used by entrypoints
submit: Callable[..., Response] = handle_request
