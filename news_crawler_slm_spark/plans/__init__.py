"""Query-plan catalog. Importing this package populates
``catalog.REGISTRY`` with every (spark builder, oracle SQL) pair."""

from . import (  # noqa: F401
    catalog,
    catalog_dedup,
    catalog_joins,
    catalog_metrics,
    catalog_multimodal,
)
from .catalog import REGISTRY  # noqa: F401
