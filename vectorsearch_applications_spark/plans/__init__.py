from .text2sql import SqlGuardError, validate_select_only, run_guarded_sql
from .router import route_queries

__all__ = [
    "SqlGuardError",
    "validate_select_only",
    "run_guarded_sql",
    "route_queries",
]
