"""Small scalar helpers (parity: /root/reference/src/oracledb_datapump/util.py).

Implemented fresh for the Spark engine; semantics match the reference where
cited. The colon-delimited parser fixes the reference's known bug of
constructing-but-not-raising on malformed input (util.py:79-82).
"""

from __future__ import annotations

import hashlib
import re
from datetime import datetime, timezone

from .exceptions import UsageError

# Manifest datetime format (reference constants.py:4).
MANIFEST_DT_FORMAT = "%Y%m%d%H%M%S%f"
# Oracle timestamp mask used for flashback literals (reference constants.py:5).
TIMESTAMP_FORMAT = "YYYY-MM-DD HH24:MI:SS.FF"
# Job-name length cap (reference constants.py:17-18, job.py:114-124).
MAX_IDENTIFIER_LENGTH = 128


def string_shortener(value: str, max_length: int) -> str:
    """Shorten a name to ``max_length`` keeping prefix+suffix readability,
    inserting a short digest marker in the middle — behavioral parity with
    the reference's k8s-style shortener (util.py:16-37)."""
    if max_length <= 0:
        raise UsageError("max_length must be positive")
    if len(value) <= max_length:
        return value
    digest = hashlib.sha256(value.encode()).hexdigest()[:8]
    marker = f"-{digest}-"
    keep = max_length - len(marker)
    if keep < 2:
        return digest[:max_length]
    head = keep - keep // 2
    tail = keep // 2
    return value[:head] + marker + (value[-tail:] if tail else "")


def parse_dt(value: str | datetime) -> datetime:
    """ISO-8601-only datetime parse (reference util.py:67-73)."""
    if isinstance(value, datetime):
        return value
    try:
        return datetime.fromisoformat(value)
    except ValueError as e:
        raise UsageError(f"Not an ISO-8601 datetime: {value!r}") from e


def parse_manifest_dt(value: str) -> datetime:
    return datetime.strptime(value, MANIFEST_DT_FORMAT)


def is_timezone_aware(dt: datetime) -> bool:
    """Reference util.py:105-106."""
    return dt.tzinfo is not None and dt.tzinfo.utcoffset(dt) is not None


def utc_now() -> datetime:
    return datetime.now(timezone.utc)


_COLON_RE = re.compile(r"^([A-Za-z0-9_]+):(.*)$")


def parse_colon_delimited(value: str) -> tuple[str, str]:
    """NAME:VALUE parse. The reference builds a ValueError but forgets to
    raise it (util.py:79-82); we raise."""
    m = _COLON_RE.match(value)
    if not m:
        raise UsageError(f"Expected NAME:VALUE, got {value!r}")
    return m.group(1), m.group(2)


class JsonEncoder:
    """Manifest JSON datetime convention (reference util.py:98-102)."""

    @staticmethod
    def format_dt(dt: datetime) -> str:
        return dt.strftime(MANIFEST_DT_FORMAT)


def coerce_bool(value: object) -> bool:
    if isinstance(value, bool):
        return value
    if isinstance(value, int):
        return bool(value)
    if isinstance(value, str):
        v = value.strip().lower()
        if v in ("1", "true", "t", "yes", "y"):
            return True
        if v in ("0", "false", "f", "no", "n"):
            return False
    raise UsageError(f"Cannot coerce {value!r} to bool")
