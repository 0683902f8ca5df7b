"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in thunder_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thunder_ray.pipelines.queries import build_oracle_sql, build_queries  # noqa: E402


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> tokens ->
    1m tier rollup (exact integer moments + fixed-expression mean/m2)."""
    from thunder_ray.pipelines.queries import rollup_documents

    return rollup_documents("/root/testdata/sf0.001", 60)


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
