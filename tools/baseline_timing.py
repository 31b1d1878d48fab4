#!/usr/bin/env python3
"""Time DuckDB executing every committed oracle VERBATIM on the same
parquet tables the engine benches against — the denominator of the
PLANS.md "baseline ratio" entries. Driver-side python only (duckdb,
pandas are NOT engine dependencies).

Usage: python3 tools/baseline_timing.py <sfDir> <verifyOutDir> [outJson]

<verifyOutDir> only supplies oracle_sql.json (a graft.Verify dump at any
SF — the SQL is SF-independent; tables are views over <sfDir>). Each
query's result is fully materialized to a DataFrame, mirroring the
engine bench's full-evaluation sink. Emits one JSON line (and
optionally writes it to [outJson]) with the same field conventions as
graft.Bench: total first, then per-query walls, plus a provenance
stamp (UTC timestamp + query count) so a regenerated artifact is
distinguishable from an edited one.
"""
import datetime
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, out_json: str = "") -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # best-of-N, same as graft.Bench (default matches its repeat=2):
    # the engine records best-of-N wall, so the baseline must too or the
    # recorded ratio compares the engine's best run against the
    # baseline's only run (r15 advice). First-pass walls kept alongside.
    repeat = int(os.environ.get("BASELINE_REPEAT", "2"))
    walls, firsts, errors = {}, {}, {}
    for name, sql in sorted(oracle.items()):
        runs = []
        for _ in range(repeat):
            t0 = time.monotonic()
            try:
                con.execute(sql).df()  # full materialization, like toRdd
                runs.append(round(time.monotonic() - t0, 3))
            except Exception as e:  # noqa: BLE001
                # errored queries stay OUT of the walls map — a partial
                # wall for a failed query is indistinguishable from a
                # fast success
                errors[name] = type(e).__name__
                runs = []
                break
        if runs:
            walls[name] = min(runs)
            firsts[name] = runs[0]
    total = round(sum(walls.values()), 3)
    line = {
        "metric": "duckdb_baseline_total", "value": total, "unit": "sec",
        "record": f"best_of_{repeat}",
        "first_total": round(sum(firsts.values()), 3),
        "errors": len(errors), "error_names": errors, "sf": sf_dir,
        "nqueries": len(oracle), "threads":
            con.execute("SELECT current_setting('threads')").fetchone()[0],
        "generated_utc":
            datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "loadavg_start": round(os.getloadavg()[0], 2),
        "queries_first": firsts,
        "queries": walls,
    }
    s = json.dumps(line)
    print(s)
    if out_json:
        with open(out_json, "w") as f:
            f.write(s + "\n")


if __name__ == "__main__":
    if not 3 <= len(sys.argv) <= 4:
        sys.exit(
            "usage: baseline_timing.py <sfDir> <verifyOutDir> [outJson]")
    main(*sys.argv[1:])
