"""JSON protocol + CLI tests (reference request.py / cli.py parity)."""

import json
import os

import pytest

from oracledb_datapump_spark import DataPump
from oracledb_datapump_spark.exceptions import UsageError


@pytest.fixture()
def duck_file(tmp_path):
    """File-backed DuckDB the CLI/protocol can reopen by URL."""
    from oracledb_datapump_spark.catalog import DuckDbConnector

    path = str(tmp_path / "proto.duckdb")
    con = DuckDbConnector(path)
    con.load_parquet_dir("hr", os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
    con.con.close()
    return path


def test_submit_status_roundtrip(spark, duck_file, tmp_path):
    dump = str(tmp_path / "proto_dump")
    req = {
        "connection": f"duckdb://{duck_file}",
        "request": "SUBMIT",
        "payload": {
            "operation": "EXPORT",
            "mode": "TABLE",
            "wait": True,
            "job_name": "PROTO-1",
            "dumpfiles": [dump],
            "directives": [
                {"name": "INCLUDE_SCHEMA", "value": "hr"},
                {"name": "INCLUDE_TABLE", "value": "nation"},
                {"name": "PARALLEL", "value": 2},
            ],
        },
    }
    resp = DataPump.submit(json.dumps(req))
    assert resp.state == "COMPLETED"
    assert resp.job_name == "PROTO-1"
    d = json.loads(resp.json())
    assert d["state"] == "COMPLETED" and d["detail"]["job_state"] == "COMPLETED"

    # STATUS against the finished job via its dump dir
    resp = DataPump.submit(
        {
            "request": "STATUS",
            "payload": {"job_name": "PROTO-1", "dumpdir": dump},
        }
    )
    assert resp.state == "COMPLETED"
    assert any(
        w["name"] == "hr.nation"
        for w in resp.to_dict()["detail"]["job_status"]["worker_status_list"]
    )


def test_submit_bad_request():
    with pytest.raises(UsageError):
        DataPump.submit({"request": "NOPE", "payload": {}})
    with pytest.raises(UsageError):
        DataPump.submit("{not json")
    with pytest.raises(UsageError):
        DataPump.submit({"request": "SUBMIT", "payload": {"operation": "EXPORT"}})


def test_submit_engine_error_wrapped(tmp_path):
    # engine failures (vs usage errors) come back as state=ERROR responses
    resp = DataPump.submit(
        {
            "connection": "parquet:///nonexistent-dir",
            "request": "SUBMIT",
            "payload": {
                "operation": "EXPORT",
                "mode": "SCHEMA",
                "wait": True,
                "dumpfiles": [str(tmp_path / "x")],
                "directives": [{"name": "INCLUDE_SCHEMA", "value": "nope"}],
            },
        }
    )
    assert resp.state == "ERROR" and resp.error


def test_cli_export_import(duck_file, tmp_path, capsys):
    from oracledb_datapump_spark.entrypoints.cli import main

    dump = str(tmp_path / "cli_dump")
    rc = main(
        [
            "export",
            "--schema", "hr",
            "--connection", f"duckdb://{duck_file}",
            "--dumpfile", dump,
            "--parallel", "2",
            "--compression", "ALL",
            "--exclude", "STATISTICS",
        ]
    )
    out = capsys.readouterr()
    assert rc == 0, out.err
    assert json.loads(out.out.strip())["state"] == "COMPLETED"
    assert "TABLE_EXPORT_DONE" in out.err  # logfile printed to stderr

    rc = main(
        [
            "import",
            "--schema", "hr",
            "--connection", f"duckdb://{duck_file}",
            "--dumpfile", dump,
            "--remap_schema", "hr:hr_cli",
            "--directive", "TABLE_EXISTS_ACTION:REPLACE",
        ]
    )
    out = capsys.readouterr()
    assert rc == 0, out.err

    from oracledb_datapump_spark.catalog import DuckDbConnector

    con = DuckDbConnector(duck_file)
    n = con.execute("SELECT count(*) FROM hr_cli.lineitem").fetchone()[0]
    assert n == 6000
    con.con.close()


def test_cli_import_requires_dumpfile(capsys):
    from oracledb_datapump_spark.entrypoints.cli import main

    rc = main(["import", "--schema", "hr", "--connection", "duckdb://"])
    assert rc == 1
    assert "required for IMPORT" in capsys.readouterr().err
