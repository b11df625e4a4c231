"""Session-keyed memo hygiene for the shared-artifact caches.

graph/dedup/similarity memoize expensive shared DataFrames (edge sets,
shingle tables, exact-ANN baselines) keyed on ``id(spark)`` so a second
query in the same session reuses the checkpointed build.  A long-lived
process that cycles SparkSessions would otherwise accumulate entries
pinning dead sessions' checkpointed blocks (round-8 advice): correctness
is unaffected — a live id cannot collide while the memo pins the old
session object — but memory grows without bound.

``evict_stale_sessions`` is called at every memo insert: any entry whose
leading key element is a DIFFERENT session id is dropped, so observing a
new session releases everything the old one owned.  Trade-off stated
plainly: two sessions used concurrently in one process will thrash each
other's memos (rebuild, never corrupt) — the single-live-session shape
every runner here uses pays zero cost.
"""

from __future__ import annotations


def evict_stale_sessions(memo: dict, session_id: int) -> None:
    """Drop entries keyed to any SparkSession other than ``session_id``.

    Keys must be tuples whose first element is ``id(spark)`` — the
    convention every shared-artifact memo in this package follows.
    """
    stale = [k for k in memo if k[0] != session_id]
    for k in stale:
        del memo[k]
