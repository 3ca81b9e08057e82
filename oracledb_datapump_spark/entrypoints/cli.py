"""CLI entry point.

Parity reference: /root/reference/src/oracledb_datapump/entrypoints/cli.py
(226 LoC). Same flag surface: op_mode {import,export,impdp,expdp},
mutually-exclusive --schema/--full/--table, --parallel --dumpfile
--compression --exclude --remap_schema --remap_tablespace --flashback_time
--directive NAME:VALUE; always wait=True; prints the logfile to stderr;
exit 0 iff COMPLETED (reference cli.py:116-149).

Connection: ``--connection URL`` (duckdb://…, parquet://…, jdbc:…), or the
reference's Oracle quartet (--username/--password/--hostname/--database)
assembled into a JDBC thin URL.

Beyond the reference (public expdp/impdp client surface the reference
never wraps):
- ``--attach JOB --command {stop,restart,kill,status}`` — the
  non-interactive form of Oracle's ATTACH=jobname interactive commands
  (STOP_JOB / START_JOB / KILL_JOB / STATUS), routed through the same
  JSON protocol handlers the request surface serves (request.py
  STOP/RESTART/KILL/STATUS). ``--dumpfile`` names the dump root for
  attaching to a job from a previous process; ``--encryption_password``
  re-supplies the secret when restarting an encrypted export (the
  manifest stores only the redacted sentinel).
- ``--parfile FILE`` — Oracle's PARFILE: one ``KEY=VALUE`` per line,
  ``#`` comments; keys are the public parameter names (SCHEMAS, TABLES,
  FULL, DUMPFILE, PARALLEL, COMPRESSION, EXCLUDE, REMAP_SCHEMA,
  REMAP_TABLESPACE, FLASHBACK_TIME, DIRECTIVE, CONNECTION, ATTACH,
  COMMAND, USERNAME, PASSWORD, HOSTNAME, DATABASE,
  ENCRYPTION_PASSWORD), comma-split where Oracle's are lists.
  Command-line flags override parfile values, as in Oracle.
- ``--list-jobs [DUMP_ROOT]`` — the DBA_DATAPUMP_JOBS listing (the view
  the reference's data-dictionary status strategy queries,
  reference status.py:366-385): live-registry jobs plus every dump set
  under DUMP_ROOT with state replayed from its event log, as a
  LIST_JOBS protocol response.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any


def parse_directives(
    parallel: int,
    compression: str | None,
    schemas: list[str],
    tables: list[str],
    exclude: list[str],
    remap_schema: list[str],
    remap_tablespace: list[str],
    flashback_time: str | None,
    directives: list[str],
) -> list[dict[str, Any]]:
    """Flag values → directive JSON dicts (reference cli.py:152-226)."""
    from ..util import parse_colon_delimited

    out: list[dict[str, Any]] = []
    for s in schemas:
        out.append({"name": "INCLUDE_SCHEMA", "value": s})
    for t in tables:
        out.append({"name": "INCLUDE_TABLE", "value": t})
    if parallel and parallel != 1:
        out.append({"name": "PARALLEL", "value": parallel})
    if compression:
        out.append({"name": "COMPRESSION", "value": compression})
    for e in exclude:
        out.append({"name": "EXCLUDE_OBJECT_TYPE", "value": e})
    for r in remap_schema:
        old, new = parse_colon_delimited(r)
        out.append({"name": "REMAP_SCHEMA", "old_value": old, "value": new})
    for r in remap_tablespace:
        old, new = parse_colon_delimited(r)
        out.append({"name": "REMAP_TABLESPACE", "old_value": old, "value": new})
    if flashback_time:
        out.append({"name": "FLASHBACK_TIME", "value": flashback_time})
    for d in directives:
        name, value = parse_colon_delimited(d)
        out.append({"name": name.upper(), "value": value})
    return out


# PARFILE key → (flag, comma_split). Values are spliced in FRONT of the
# command line so explicit flags override parfile entries (Oracle's
# documented precedence).
_PARFILE_MULTI = {
    "schemas": "--schema",
    "schema": "--schema",
    "tables": "--table",
    "table": "--table",
    "dumpfile": "--dumpfile",
    "exclude": "--exclude",
    "remap_schema": "--remap_schema",
    "remap_tablespace": "--remap_tablespace",
    "directive": "--directive",
}
_PARFILE_SINGLE = {
    "parallel": "--parallel",
    "compression": "--compression",
    "flashback_time": "--flashback_time",
    "connection": "--connection",
    "attach": "--attach",
    "command": "--command",
    "username": "--username",
    "password": "--password",
    "hostname": "--hostname",
    "database": "--database",
    "encryption_password": "--encryption_password",
}


def expand_parfile(path: str) -> list[str]:
    """PARFILE lines → argv tokens (public Oracle client surface: one
    KEY=VALUE per line, '#' comments; list-valued parameters
    comma-split)."""
    from ..exceptions import UsageError

    out: list[str] = []
    with open(path) as f:
        for ln, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            key, eq, value = line.partition("=")
            key, value = key.strip().lower(), value.strip()
            if not eq or not key or not value:
                raise UsageError(
                    f"{path}:{ln}: parfile lines are KEY=VALUE, got {raw!r}"
                )
            if key == "full":
                if value.upper() in ("Y", "YES", "TRUE"):
                    out.append("--full")
            elif key in _PARFILE_MULTI:
                for v in value.split(","):
                    if v.strip():
                        out += [_PARFILE_MULTI[key], v.strip()]
            elif key in _PARFILE_SINGLE:
                out += [_PARFILE_SINGLE[key], value]
            else:
                raise UsageError(
                    f"{path}:{ln}: unknown parfile parameter {key.upper()!r}"
                )
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="oracledb-datapump-spark",
        description="Spark-native Datapump (reference-parity feature set)",
    )
    parser.add_argument("op_mode", choices=["import", "export", "impdp", "expdp"])

    # not required at the argparse level: --attach needs no job mode, and
    # a parfile may carry it; validated after parfile expansion below
    job_mode = parser.add_mutually_exclusive_group()
    job_mode.add_argument("--schema", action="append", default=[])
    job_mode.add_argument("--full", action="store_true")
    job_mode.add_argument("--table", action="append", default=[])
    parser.add_argument(
        "--attach", metavar="JOB",
        help="attach to an existing job by name (Oracle ATTACH=jobname)",
    )
    parser.add_argument(
        "--command", choices=["stop", "restart", "kill", "status"],
        help="non-interactive ATTACH command (default: status)",
    )
    parser.add_argument(
        "--encryption_password",
        help="re-supply the secret when restarting an encrypted export",
    )
    parser.add_argument(
        "--parfile", metavar="FILE",
        help="read parameters from FILE (one KEY=VALUE per line)",
    )
    parser.add_argument(
        "--list-jobs", metavar="DUMP_ROOT", dest="list_jobs", nargs="?",
        const="", default=None,
        help="enumerate known jobs (DBA_DATAPUMP_JOBS analog): the live "
        "registry plus every dump set under DUMP_ROOT",
    )

    parser.add_argument(
        "--connection",
        help="connector URL (duckdb://, parquet://, orc://, json://, csv://, jdbc:)",
    )
    parser.add_argument("--username", help="DB username (JDBC)")
    parser.add_argument("--password", help="DB password (JDBC)")
    parser.add_argument("--hostname", help="DB host (JDBC)")
    parser.add_argument("--database", help="DB service name (JDBC)")
    parser.add_argument("--parallel", default=1, type=int)
    parser.add_argument(
        "--dumpfile", action="append", default=[],
        help="dump-set directory — required for import",
    )
    parser.add_argument(
        "--compression", choices=["DATA_ONLY", "METADATA_ONLY", "ALL", "NONE"]
    )
    parser.add_argument("--exclude", action="append", default=[])
    parser.add_argument(
        "--remap_schema", action="append", default=[], help="FROM_SCHEMA:TO_SCHEMA"
    )
    parser.add_argument(
        "--remap_tablespace", action="append", default=[], help="FROM:TO"
    )
    parser.add_argument("--flashback_time", default=None, help="ISO timestamp")
    parser.add_argument(
        "--directive", action="append", default=[], help="NAME:VALUE"
    )

    from ..exceptions import JobNotFound, UsageError

    argv = list(sys.argv[1:] if argv is None else argv)
    par_paths = []
    for i, a in enumerate(argv):
        if a == "--parfile" and i + 1 < len(argv):
            par_paths.append(argv[i + 1])
        elif a.startswith("--parfile="):
            par_paths.append(a.split("=", 1)[1])
    expanded: list[str] = []
    try:
        for p in par_paths:
            expanded += expand_parfile(p)
    except (UsageError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    # parfile tokens FIRST: argparse lets later (explicit) flags override
    # earlier single-valued ones — Oracle's command-line-wins precedence
    args = parser.parse_args(expanded + argv)

    if args.connection:
        connection: Any = args.connection
    elif args.hostname and args.database:
        connection = {
            "url": f"jdbc:oracle:thin:@//{args.hostname}/{args.database}",
            "user": args.username,
            "password": args.password,
        }
    else:
        connection = None

    from ..client import DataPump

    # -- LIST_JOBS mode: the DBA_DATAPUMP_JOBS listing over the protocol --
    if args.list_jobs is not None:
        payload = {"dump_root": args.list_jobs or None}
        try:
            response = DataPump.submit(
                json.dumps({"request": "LIST_JOBS", "payload": payload})
            )
        except UsageError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(response.json())
        return 0

    # -- ATTACH mode: route the interactive commands over the protocol ----
    if args.attach:
        cmd = (args.command or "status").upper()
        payload: dict[str, Any] = {"job_name": args.attach}
        if args.dumpfile:
            payload["dumpdir"] = str(args.dumpfile[0])
        if args.encryption_password:
            if cmd != "RESTART":
                print(
                    "--encryption_password only applies to "
                    "--command restart",
                    file=sys.stderr,
                )
                return 1
            payload["encryption_password"] = args.encryption_password
        request: dict[str, Any] = {"request": cmd, "payload": payload}
        if connection is not None:
            request["connection"] = connection
        try:
            response = DataPump.submit(json.dumps(request))
        except (UsageError, JobNotFound) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(response.json())
        ok_states = {
            "STOP": {"STOP_PENDING", "STOPPING", "STOPPED"},
            "RESTART": {"COMPLETED"},
            "KILL": {"NOT_RUNNING"},
        }.get(cmd)
        if response.state == "ERROR":
            return 1
        return 0 if ok_states is None or response.state in ok_states else 1

    if args.command:
        print("--command requires --attach JOB", file=sys.stderr)
        return 1
    if not (args.schema or args.full or args.table):
        print(
            "one of --schema/--full/--table is required (or --attach JOB)",
            file=sys.stderr,
        )
        return 1

    op_map = {"import": "IMPORT", "impdp": "IMPORT", "export": "EXPORT", "expdp": "EXPORT"}
    operation = op_map[args.op_mode.lower()]
    mode = "SCHEMA" if args.schema else ("TABLE" if args.table else "FULL")

    if operation == "IMPORT" and not args.dumpfile:
        print("--dumpfile argument is required for IMPORT!", file=sys.stderr)
        return 1

    if connection is None:
        print("Provide --connection or --hostname/--database", file=sys.stderr)
        return 1

    try:
        directives = parse_directives(
            parallel=args.parallel,
            compression=args.compression,
            schemas=args.schema,
            tables=args.table,
            exclude=args.exclude,
            remap_schema=args.remap_schema,
            remap_tablespace=args.remap_tablespace,
            flashback_time=args.flashback_time,
            directives=args.directive,
        )
    except UsageError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    request = {
        "connection": connection,
        "request": "SUBMIT",
        "payload": {
            "operation": operation,
            "mode": mode,
            "wait": True,  # reference cli.py:119
            "dumpfiles": [str(d) for d in args.dumpfile],
            "directives": directives,
        },
    }

    try:
        response = DataPump.submit(json.dumps(request))
    except UsageError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    # print the job log to stderr (reference cli.py:135-149)
    if response.detail and response.detail.logfile:
        try:
            with open(response.detail.logfile) as f:
                print(f.read(), file=sys.stderr)
        except OSError:
            pass
    print(response.json())
    return 0 if response.state == "COMPLETED" else 1


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
