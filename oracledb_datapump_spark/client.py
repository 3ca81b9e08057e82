"""DataPump facade (parity: /root/reference/src/oracledb_datapump/client.py:21-75)."""

from __future__ import annotations

from typing import Any

from .dumpset import DumpFileInfo, DumpSet


class DataPump:
    """Top-level convenience API."""

    @staticmethod
    def submit(request: "str | dict | Any"):
        """JSON request → Response (reference client.py:21-27)."""
        from .request import handle_request

        return handle_request(request)

    @staticmethod
    def open_file(path: str, mode: str = "r", encoding: str = "utf-8"):
        """Artifact helper (reference client.py:29-43; ora_open files.py:659-766
        collapses to plain open on a real filesystem)."""
        if "b" in mode:
            return open(path, mode)
        return open(path, mode, encoding=encoding)

    @staticmethod
    def get_dumpfile_info(dumpdir: str, schema: str, table: str) -> DumpFileInfo:
        """Reference client.py:45-53 → files.py:387-408."""
        return DumpSet(dumpdir).get_dumpfile_info(schema, table)

    @staticmethod
    def get_logfile(dumpdir: str) -> str:
        """Reference client.py:55-60."""
        return DumpSet(dumpdir).read_logfile()
