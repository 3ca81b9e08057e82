"""HTTP adapter: the reference's AWS-Lambda entry point re-expressed as a
framework-free WSGI app + stdlib server.

Parity reference: /root/reference/src/oracledb_datapump/entrypoints/
aws_lambda.py (236 LoC): envelope parse + base64 body decode (:137-148),
HTTP status mapping + validation-error formatting (:52-105), correlation
id (:202), and the secrets-resolution gate (:108-130) re-expressed
cloud-agnostically: a ``connection.secret`` name resolves from the
``DATAPUMP_SECRET_<NAME>`` environment variable (JSON payload merged into
the connection) only when ``DATAPUMP_RESOLVE_SECRETS`` is enabled —
otherwise it errors, exactly like the reference's RESOLVE_SECRETS flag.
The handler shape (JSON request in → JSON response out over POST) is
identical, so an actual Lambda/ALB wrapper is a 10-line shim over
``handle_event``.
"""

from __future__ import annotations

import base64
import json
import os
import re
import uuid
from typing import Any

RESOLVE_SECRETS_ENV = "DATAPUMP_RESOLVE_SECRETS"
SECRET_ENV_PREFIX = "DATAPUMP_SECRET_"


def resolve_connection_secret(request: dict[str, Any]) -> dict[str, Any]:
    """Reference aws_lambda.py:108-130 (ConnectWithSecretModel): a
    ``connection.secret`` field is swapped for the secret's JSON payload,
    gated behind an explicit opt-in flag. The secret store here is the
    process environment (the cloud-agnostic lowest common denominator);
    a managed-store integration overrides this function."""
    from ..exceptions import UsageError

    conn = request.get("connection")
    if not isinstance(conn, dict) or "secret" not in conn:
        return request
    name = str(conn.pop("secret"))
    if os.environ.get(RESOLVE_SECRETS_ENV, "").lower() not in ("1", "true", "yes"):
        raise UsageError(
            "A connection secret was passed but "
            f"{RESOLVE_SECRETS_ENV} is not enabled!"
        )
    env_key = SECRET_ENV_PREFIX + re.sub(r"[^A-Za-z0-9]", "_", name).upper()
    raw = os.environ.get(env_key)
    if raw is None:
        raise UsageError(f"Failed to fetch secret: {name} (no ${env_key})")
    try:
        values = json.loads(raw)
    except json.JSONDecodeError as e:
        raise UsageError(f"Failed to parse secret: {name} reason: {e}") from e
    if not isinstance(values, dict):
        raise UsageError(f"Secret {name} must be a JSON object")
    conn.update(values)
    return request


def handle_event(event: dict[str, Any], spark=None) -> dict[str, Any]:
    """Lambda-style handler: {"body": <json|b64>, ...} or a raw request
    dict → {"statusCode", "headers", "body"} (reference aws_lambda.py:164-236)."""
    from ..exceptions import JobNotFound, UsageError
    from ..request import handle_request

    correlation_id = str(uuid.uuid4())
    try:
        if "body" in event:  # ALB/APIGW envelope (reference :204-222)
            body = event["body"]
            if event.get("isBase64Encoded"):
                body = base64.b64decode(body).decode()  # reference :137-148
            request = json.loads(body) if isinstance(body, str) else body
        else:
            request = event
        request = resolve_connection_secret(request)
        response = handle_request(request, spark=spark)
        status = 200 if response.state != "ERROR" else 500
        payload = response.to_dict()
    except JobNotFound as e:
        status, payload = 404, {"error": str(e)}
    except UsageError as e:  # validation → 400 (reference :52-105)
        status, payload = 400, {"error": str(e)}
    except json.JSONDecodeError as e:
        status, payload = 400, {"error": f"Bad JSON body: {e}"}
    except Exception as e:  # pragma: no cover - defensive
        status, payload = 500, {"error": str(e)}
    payload["correlation_id"] = correlation_id
    return {
        "statusCode": status,
        "headers": {"Content-Type": "application/json"},
        "body": json.dumps(payload, default=str),
    }


def wsgi_app(environ, start_response):
    """Minimal WSGI app wrapping handle_event (POST /)."""
    if environ.get("REQUEST_METHOD") != "POST":
        start_response("405 Method Not Allowed", [("Content-Type", "text/plain")])
        return [b"POST a datapump JSON request"]
    try:
        length = int(environ.get("CONTENT_LENGTH") or 0)
        body = environ["wsgi.input"].read(length).decode() if length else "{}"
    except (ValueError, KeyError):
        body = "{}"
    result = handle_event({"body": body})
    reasons = {
        200: "OK",
        400: "Bad Request",
        404: "Not Found",
        500: "Internal Server Error",
    }
    start_response(
        f"{result['statusCode']} {reasons[result['statusCode']]}",
        list(result["headers"].items()),
    )
    return [result["body"].encode()]


def serve(host: str = "127.0.0.1", port: int = 8765):  # pragma: no cover
    """Dev server: ``python -m oracledb_datapump_spark.entrypoints.http``."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, wsgi_app) as srv:
        print(f"datapump http listening on {host}:{port}")
        srv.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    serve()
