"""Import all query modules so registration side effects populate the registry."""

from . import (  # noqa: F401
    aggregations,
    elementwise,
    flagship,
    joins,
    scalar_fns,
    scans,
    setops,
    windows,
)
from ._registry import ORACLES, QUERIES, register  # noqa: F401
