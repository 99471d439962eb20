"""Re-verify every driver query/oracle pair at an arbitrary scale.

The per-pair gate (tests/test_entry_contract.py) runs at sf0.01; this
sweep replays the same rows/columns/values comparison at any sf dir
(default sf0.1) in one session, printing one JSON summary line.

Usage: python scripts/sweep_entries.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from xf_spark.session import get_spark, quiet_stop

    spark = get_spark("sweep", cores=args.cores)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    t_all = time.time()
    try:
        for name in queries:
            t0 = time.time()
            try:
                sdf = queries[name](spark, args.sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                ok_cols = sorted(scols) == sorted(ocols)
                got, want = _rowset(srows, scols), _rowset(orows, ocols)
                results[name] = {
                    "match": ok_cols and got == want,
                    "rows": len(got),
                    "oracle_rows": len(want),
                    "sec": round(time.time() - t0, 2),
                }
            except Exception as exc:  # noqa: BLE001 — sweep must finish
                results[name] = {
                    "match": False,
                    "err": f"{type(exc).__name__}: {exc}"[:200],
                    "sec": round(time.time() - t0, 2),
                }
            status = "MATCH" if results[name]["match"] else "FAIL"
            print(f"{status} {name} ({results[name]['sec']}s)",
                  file=sys.stderr, flush=True)
        n_ok = sum(1 for r in results.values() if r["match"])
        print(json.dumps({
            "sf_dir": args.sf_dir,
            "n_pairs": len(results),
            "n_match": n_ok,
            "wall_sec": round(time.time() - t_all, 1),
            "failures": {k: v for k, v in results.items() if not v["match"]},
        }))
    finally:
        con.close()
        quiet_stop(spark)


if __name__ == "__main__":
    main()
