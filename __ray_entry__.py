"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the interleaved
    document table -> span extractors -> grid-bucketed shell-count join
    -> per-halo histograms."""
    from spatialjoincountovershells_ray.queries import q_shell_count_docs

    return q_shell_count_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from spatialjoincountovershells_ray.queries import REGISTRY

    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from spatialjoincountovershells_ray.queries import REGISTRY

    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
