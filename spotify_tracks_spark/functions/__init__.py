"""Pure Column-expression helpers (the "expression kernel").

These replace the reference's compile-time Jinja macros (dbt-utils 1.2.0) with
ordinary Python functions returning Catalyst ``Column`` trees — no UDFs, fully
inside whole-stage codegen.
"""

from .keys import surrogate_key
from .math_utils import safe_divide
from .time_utils import to_local_wallclock, within_trailing_days
from .hashing import portable_hash60

__all__ = [
    "surrogate_key",
    "safe_divide",
    "to_local_wallclock",
    "within_trailing_days",
    "portable_hash60",
]
