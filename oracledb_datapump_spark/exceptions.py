"""Exception taxonomy (parity: /root/reference/src/oracledb_datapump/exceptions.py:1-38)."""

from __future__ import annotations

from typing import Any


class DataPumpError(Exception):
    """Base for all engine errors."""


class UsageError(DataPumpError):
    """Invalid API usage (bad arguments, missing dumpfiles on import)."""


class InvalidObjectType(UsageError):
    """An EXCLUDE/INCLUDE object type not in the valid registry
    (reference exceptions.py:4-11). Carries the valid list."""

    def __init__(self, got: str, valid: list[str]):
        self.got = got
        self.valid = sorted(valid)
        super().__init__(
            f"Invalid object type {got!r}. Valid types: {', '.join(self.valid)}"
        )


class InvalidDirective(UsageError):
    """Unknown directive name or bad directive value."""


class JobNotFound(DataPumpError):
    """Attach target does not exist (reference commands.py:247-259)."""


class JobError(DataPumpError):
    """Job failed; carries collected status detail
    (reference status.py:586-629 BadRequest-with-status pattern)."""

    def __init__(self, message: str, status: Any | None = None):
        self.status = status
        super().__init__(message)


class FileError(DataPumpError):
    """Dump-set / artifact file errors."""


class Unsupported(DataPumpError):
    """Feature accepted by the reference but intentionally not implemented
    here (reference exceptions.py:34-35 precedent)."""
