from .text2sql import SqlGuardError, validate_select_only, run_guarded_sql
from .router import route_queries
from .routed import routed_query_pipeline

__all__ = [
    "SqlGuardError",
    "validate_select_only",
    "run_guarded_sql",
    "route_queries",
    "routed_query_pipeline",
]
