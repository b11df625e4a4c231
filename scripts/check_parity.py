"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry and compare against its ``oracle_sql()`` at a given SF.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from harness import compare  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from spotify_tracks_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    # full surface: driver-checked 50 + pytest-only extras
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}
    oracles = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, oracles[name], sf_dir)
            else:
                ok, msg = df.count() >= 0, f"rows-only ({df.count()} rows)"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
            traceback.print_exc()
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'}  {name:28s} {dt:6.1f}s  {msg}")
        failures += 0 if ok else 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
