"""Import all query modules so registration side effects populate the registry."""

from . import elementwise, flagship, scalar_fns, scans  # noqa: F401
from ._registry import ORACLES, QUERIES, register  # noqa: F401
