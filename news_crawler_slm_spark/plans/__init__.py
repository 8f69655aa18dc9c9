"""Query-plan catalog. Importing this package populates
``catalog.REGISTRY`` with every (spark builder, oracle SQL) pair."""

from . import catalog, catalog_dedup, catalog_joins  # noqa: F401
from .catalog import REGISTRY  # noqa: F401
