#!/usr/bin/env python3
"""Local dev harness emulating the driver's correctness gate:
run Verify's parquet dumps against DuckDB executing oracle_sql.json on
the same source tables. NOT part of the engine (driver-side python only).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [skip1,skip2,...]

The optional third arg skips named queries (kept for ad-hoc use; the
default skip list is empty).

Every committed oracle runs VERBATIM, t15/t23 included: their connected
components are authored as bounded materialized min-label rounds with
pointer jumping (LlmQueries.ccRounds — the t62/t83/t84/t85 chained-CTE
discipline), tractable at every SF, so this harness no longer carries
any per-query rewrite.
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def frame_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main(sf_dir: str, out_dir: str, skip: str = "") -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skipped = {s for s in skip.split(",") if s}
    for miss in sorted(skipped - oracle.keys()):
        print(f"WARN skip entry '{miss}' matches no oracle query "
              "(typo or stale name after a rename?)")
    ok = bad = n_skipped = 0
    for name, sql in sorted(oracle.items()):
        if name in skipped:
            print(f"skip {name}")
            n_skipped += 1
            continue
        try:
            expect = canon(con.execute(sql).df())
            got = canon(duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        schema_e = [(c, str(expect[c].dtype)) for c in expect.columns]
        schema_g = [(c, str(got[c].dtype)) for c in got.columns]
        if schema_e != schema_g:
            print(f"FAIL {name}: schema\n  oracle {schema_e}\n  spark  {schema_g}")
            bad += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows oracle={len(expect)} spark={len(got)}")
            bad += 1
            continue
        he, hg = frame_hash(expect), frame_hash(got)
        if he != hg:
            print(f"FAIL {name}: hash mismatch")
            diff = expect.compare(got) if expect.shape == got.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10).to_string())
            bad += 1
            continue
        ok += 1
        print(f"ok   {name} ({len(got)} rows)")
    tail = f", {n_skipped} skipped" if n_skipped else ""
    # provenance stamp: a regenerated run is distinguishable from an
    # edited transcript (timestamp + oracle count + corpus dir)
    import datetime
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat()
    print(f"\n{ok} ok, {bad} failed{tail}  "
          f"[{len(oracle)} oracles, {sf_dir}, {stamp}]")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "")
