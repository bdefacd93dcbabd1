from .queries import ORACLE_REGISTRY, QUERY_REGISTRY
from . import queries_ext  # noqa: F401  (registers extension queries)

__all__ = ["ORACLE_REGISTRY", "QUERY_REGISTRY"]
