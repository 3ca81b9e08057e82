"""HTTP/Lambda-style adapter tests (reference aws_lambda.py parity)."""

import base64
import json
import os

import pytest

from oracledb_datapump_spark.entrypoints.http import handle_event, wsgi_app


@pytest.fixture()
def duck_file(tmp_path):
    from oracledb_datapump_spark.catalog import DuckDbConnector

    path = str(tmp_path / "http.duckdb")
    con = DuckDbConnector(path)
    con.load_parquet_dir(
        "hr", os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    )
    con.con.close()
    return path


def _submit_event(duck_file, dump, b64=False):
    body = json.dumps(
        {
            "connection": f"duckdb://{duck_file}",
            "request": "SUBMIT",
            "payload": {
                "operation": "EXPORT",
                "mode": "TABLE",
                "wait": True,
                "dumpfiles": [dump],
                "directives": [
                    {"name": "INCLUDE_SCHEMA", "value": "hr"},
                    {"name": "INCLUDE_TABLE", "value": "region"},
                ],
            },
        }
    )
    if b64:
        return {
            "body": base64.b64encode(body.encode()).decode(),
            "isBase64Encoded": True,
        }
    return {"body": body}


def test_handle_event_submit(spark, duck_file, tmp_path):
    res = handle_event(_submit_event(duck_file, str(tmp_path / "d1")), spark=spark)
    assert res["statusCode"] == 200
    body = json.loads(res["body"])
    assert body["state"] == "COMPLETED"
    assert body["correlation_id"]


def test_handle_event_base64_envelope(spark, duck_file, tmp_path):
    res = handle_event(
        _submit_event(duck_file, str(tmp_path / "d2"), b64=True), spark=spark
    )
    assert res["statusCode"] == 200


def test_handle_event_validation_400():
    res = handle_event({"body": json.dumps({"request": "NOPE"})})
    assert res["statusCode"] == 400
    assert "error" in json.loads(res["body"])
    res = handle_event({"body": "{not json"})
    assert res["statusCode"] == 400


def test_wsgi_roundtrip():
    import io

    body = json.dumps({"request": "NOPE"}).encode()
    statuses = []
    environ = {
        "REQUEST_METHOD": "POST",
        "CONTENT_LENGTH": str(len(body)),
        "wsgi.input": io.BytesIO(body),
    }
    out = wsgi_app(environ, lambda s, h: statuses.append(s))
    assert statuses[0].startswith("400")
    assert b"error" in out[0]

    statuses.clear()
    out = wsgi_app({"REQUEST_METHOD": "GET"}, lambda s, h: statuses.append(s))
    assert statuses[0].startswith("405")


def test_secret_resolution_gate(monkeypatch):
    """Reference aws_lambda.py:108-130: connection.secret resolves only
    when the flag is enabled; payload merges into the connection."""
    from oracledb_datapump_spark.entrypoints.http import (
        resolve_connection_secret,
    )
    from oracledb_datapump_spark.exceptions import UsageError

    req = {"connection": {"secret": "prod-db"}}
    # gate closed → error (matches the reference's RESOLVE_SECRETS check)
    monkeypatch.delenv("DATAPUMP_RESOLVE_SECRETS", raising=False)
    try:
        resolve_connection_secret(dict(req, connection=dict(req["connection"])))
        raise AssertionError("expected UsageError")
    except UsageError as e:
        assert "not enabled" in str(e)

    monkeypatch.setenv("DATAPUMP_RESOLVE_SECRETS", "1")
    monkeypatch.setenv(
        "DATAPUMP_SECRET_PROD_DB",
        json.dumps({"url": "duckdb://:memory:", "user": "svc"}),
    )
    out = resolve_connection_secret(
        {"connection": {"secret": "prod-db", "driver": "d"}}
    )
    assert out["connection"] == {
        "driver": "d",
        "url": "duckdb://:memory:",
        "user": "svc",
    }

    # missing secret name → clear failure
    try:
        resolve_connection_secret({"connection": {"secret": "nope"}})
        raise AssertionError("expected UsageError")
    except UsageError as e:
        assert "Failed to fetch secret" in str(e)

    # requests without a secret pass through untouched
    plain = {"connection": {"url": "x"}}
    assert resolve_connection_secret(plain) is plain
