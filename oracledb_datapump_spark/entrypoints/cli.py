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


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="oracledb-datapump-spark",
        description="Spark-native Datapump (reference-parity feature set)",
    )
    parser.add_argument("op_mode", choices=["import", "export", "impdp", "expdp"])

    job_mode = parser.add_mutually_exclusive_group(required=True)
    job_mode.add_argument("--schema", action="append", default=[])
    job_mode.add_argument("--full", action="store_true")
    job_mode.add_argument("--table", action="append", default=[])

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

    args = parser.parse_args(argv)

    op_map = {"import": "IMPORT", "impdp": "IMPORT", "export": "EXPORT", "expdp": "EXPORT"}
    operation = op_map[args.op_mode.lower()]
    mode = "SCHEMA" if args.schema else ("TABLE" if args.table else "FULL")

    if operation == "IMPORT" and not args.dumpfile:
        print("--dumpfile argument is required for IMPORT!", file=sys.stderr)
        return 1

    if args.connection:
        connection: Any = args.connection
    elif args.hostname and args.database:
        connection = {
            "url": f"jdbc:oracle:thin:@//{args.hostname}/{args.database}",
            "user": args.username,
            "password": args.password,
        }
    else:
        print("Provide --connection or --hostname/--database", file=sys.stderr)
        return 1

    from ..exceptions import UsageError

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

    from ..client import DataPump

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
