"""Surrogate-key generation with byte-exact dbt-utils parity.

The reference builds every key via ``dbt_utils.generate_surrogate_key([...])``
(stg_recent_tracks.sql:2-17), which expands to::

    md5(concat(coalesce(cast(c1 as varchar), '_dbt_utils_surrogate_key_null_'),
               '-', coalesce(cast(c2 as varchar), ...), ...))

``concat_ws("-", ...)`` is equivalent here because every argument is already
coalesced to non-NULL before joining (concat_ws skips NULLs; coalesce-first
means it never sees one) — SURVEY.md §2.3.  Output: 32-char lowercase hex,
byte-identical to DuckDB's ``md5()``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..config import SK_NULL_SENTINEL


def surrogate_key(*cols: Column | str) -> Column:
    """md5-hex surrogate key over the given columns, dbt-utils 1.2.0 semantics."""
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit(SK_NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))
