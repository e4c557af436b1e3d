#!/usr/bin/env python
"""One-session replica of the driver's correctness gate over the JUDGED
WINDOW (first 50 registered queries) in registration order at sf0.01 -
the exact conditions CORRECTNESS_r{N}.json is recorded under.

Usage: python scripts/replica_sweep.py [--all] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import (
    JUDGED_NAMES,
    ORACLES,
    QUERIES,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.session import (
    get_spark,
)


def main() -> None:
    from test_oracle_parity import _rowset, oracle_result

    sf_dir = "/root/testdata/sf0.01"
    names = list(JUDGED_NAMES)
    if "--all" in sys.argv:
        names = list(QUERIES)
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark(app_name="replica-sweep")
    t_all = time.perf_counter()
    n_ok = 0
    failures = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in ORACLES:
                status = f"rows-only ({len(s_rows)})"
                n_ok += 1
            else:
                o_cols, o_rows = oracle_result(ORACLES[name], sf_dir)
                ok_cols = sorted(s_cols) == sorted(
                    c.lower() for c in o_cols
                )
                ok_rows = len(s_rows) == len(o_rows)
                ok_vals = ok_cols and ok_rows and _rowset(
                    s_cols, s_rows
                ) == _rowset([c.lower() for c in o_cols], o_rows)
                if ok_cols and ok_rows and ok_vals:
                    status = f"OK ({len(s_rows)} rows)"
                    n_ok += 1
                else:
                    status = (
                        f"FAIL cols={ok_cols} rows={ok_rows} "
                        f"vals={ok_vals} ({len(s_rows)} vs {len(o_rows)})"
                    )
                    failures.append(name)
        except Exception as e:  # noqa: BLE001 - sweep must report, not die
            status = f"ERR {type(e).__name__}: {str(e)[:200]}"
            failures.append(name)
        print(
            f"{i + 1:3d}/{len(names)} {name}: {status} "
            f"[{time.perf_counter() - t0:.1f}s]",
            flush=True,
        )
    print(
        f"== {n_ok}/{len(names)} OK in {time.perf_counter() - t_all:.0f}s; "
        f"failures: {failures}"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
