"""HTTP adapter: the reference's AWS-Lambda entry point re-expressed as a
framework-free WSGI app + stdlib server.

Parity reference: /root/reference/src/oracledb_datapump/entrypoints/
aws_lambda.py (236 LoC): envelope parse + base64 body decode (:137-148),
HTTP status mapping + validation-error formatting (:52-105), correlation
id (:202). Secrets-manager resolution is cloud-specific and out of scope;
the handler shape (JSON request in → JSON response out over POST) is
identical, so an actual Lambda/ALB wrapper is a 10-line shim over
``handle_event``.
"""

from __future__ import annotations

import base64
import json
import uuid
from typing import Any


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
