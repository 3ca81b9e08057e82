"""``python -m oracledb_datapump_spark`` → CLI (reference __main__.py:1-4)."""

import sys

from .entrypoints.cli import main

sys.exit(main())
