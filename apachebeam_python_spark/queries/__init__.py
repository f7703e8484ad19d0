"""Import all query modules so registration side effects populate the registry."""

from . import (  # noqa: F401
    aggregations,
    analytics,
    elementwise,
    event_time,
    flagship,
    joins,
    llm,
    scalar_fns,
    scans,
    setops,
    streaming_q,
    udfs,
    windows,
)
from ._registry import ORACLES, QUERIES, register  # noqa: F401
