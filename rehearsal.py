"""Full-surface dress rehearsal: run EVERY queries() entry at a small
scale factor and, where an oracle_sql() entry exists, compare against
DuckDB exactly the way the driver does (sorted columns, sorted rows,
dtype-strict, value-equal). Writes one JSON artifact per run.

Usage:  python rehearsal.py [sf_dir] [out.json]
Defaults: /root/testdata/sf0.01 REHEARSAL_latest.json
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import duckdb
import pandas as pd
import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "REHEARSAL_latest.json"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    # warm the worker pool + executor once so the first query's timing
    # isn't session-startup (previously charged ~3s to whichever query
    # ran first)
    ray.data.range(32).map_batches(lambda b: b).materialize()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    res: dict[str, dict] = {}
    failed = 0
    for name, fn in queries.items():
        t0 = time.time()
        try:
            got = fn(sf_dir)
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
            rec = {"rows": int(len(got)), "sec": round(time.time() - t0, 2)}
            if name in oracles:
                want = con.execute(oracles[name]).df()
                g, w = _canon(got), _canon(want)
                ok = (
                    list(g.columns) == list(w.columns)
                    and len(g) == len(w)
                    and list(map(str, g.dtypes)) == list(map(str, w.dtypes))
                    and g.equals(w)
                )
                rec["oracle"] = "match" if ok else "MISMATCH"
                if not ok:
                    failed += 1
                    rec["oracle_rows"] = int(len(want))
            else:
                rec["oracle"] = "rows_only"
                if len(got) == 0:
                    failed += 1
                    rec["oracle"] = "EMPTY"
        except Exception:
            failed += 1
            rec = {"rows": -1, "sec": round(time.time() - t0, 2),
                   "oracle": "ERROR", "err": traceback.format_exc(limit=3)}
        res[name] = rec
        flag = "" if rec["oracle"] in ("match", "rows_only") else "  <<<< "
        print(f"{name:28s} {rec['sec']:7.2f}s rows={rec['rows']:<8d} {rec['oracle']}{flag}",
              flush=True)

    json.dump(res, open(out_path, "w"), indent=1)
    n_sql = sum(1 for r in res.values() if r["oracle"] == "match")
    print(json.dumps({"queries": len(res), "sql_match": n_sql, "failed": failed,
                      "total_sec": round(sum(r["sec"] for r in res.values()), 1)}))
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
