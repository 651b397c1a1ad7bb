#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling, not part of
the library): compare each dumped query result against its DuckDB oracle
on the same sf parquet tables.

Usage: python3 tools/oracle_compare.py <sfDir> <outDir> [query ...]
"""
import os
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return list(df.columns), sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False))


def connect(sf_dir, mem, tmp, db):
    """Fresh connection with views + memory/spill settings.

    FILE-BACKED on purpose: this environment ships DuckDB 1.0.0, where an
    in-memory database IGNORES temp_directory (out-of-core temp support
    for in-memory DBs landed in 1.1) — on an in-memory connection a
    pair-heavy oracle at the sf1.0 decade dies with "bad allocation" at
    the memory_limit instead of spilling, regardless of settings
    (observed: the same 48 heavy queries failed identically at
    24/60/80GB limits, alone on a 125GB-free host)."""
    con = duckdb.connect(db)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    # ORACLE_DUCKDB_THREADS: big-decade pair oracles whose plan is a
    # UNION of count-gated geometry branches execute the branches'
    # joins CONCURRENTLY at default threads (= all cores), multiplying
    # peak memory by the branch count — capping threads serializes the
    # pipelines and trades wall time for fitting in the limit.
    thr = os.environ.get("ORACLE_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table dirs (localdata/sf0.5)
            path += "/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{path}')")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        names = sorted(oracle.keys())
    # 96GB default: big-decade pair oracles legitimately peak tens of GB,
    # and 1.0.0 cannot spill every operator (list-carrying hash joins);
    # the spill path catches what IS spillable.
    mem = os.environ.get("ORACLE_DUCKDB_MEM", "96GB")
    tmp = os.environ.get("ORACLE_DUCKDB_TMP", "/tmp/duckdb_oracle_spill")
    os.makedirs(tmp, exist_ok=True)
    db = f"{tmp}/oracle.duckdb"
    for stale in (db, db + ".wal"):  # a crashed prior run must not leak state
        if os.path.exists(stale):
            os.remove(stale)
    con = connect(sf_dir, mem, tmp, db)
    fails = 0
    for name in names:
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"{name}: ERR reading spark dump: {e}", flush=True)
            fails += 1
            continue
        if name not in oracle:
            print(f"{name}: NO_ORACLE rows={len(sp)}", flush=True)
            continue
        try:
            orc = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ERR oracle: {e}", flush=True)
            fails += 1
            # An OOM'd query POISONS its 1.0.0 DATABASE INSTANCE: the
            # errored query's buffer reservation is not fully released,
            # so every later query also dies with "bad allocation"
            # (observed twice: one heavy OOM cascaded through 48 and 130
            # alphabetic successors) — and the python module CACHES the
            # instance per path, so reconnecting to the same file keeps
            # the poisoned buffer manager (reconnect-then-query
            # segfaulted). Quarantine by reopening at a FRESH path —
            # views are metadata-only, so this costs nothing and later
            # queries judge on their own merits.
            try:
                con.close()
            except Exception:
                pass
            db = f"{tmp}/oracle_{name}.duckdb"
            try:
                con = connect(sf_dir, mem, tmp, db)
            except Exception as e2:
                print(f"RECONNECT FAILED after {name}: {e2}", flush=True)
                break
            continue
        sp_cols, sp_rows = canon(sp)
        orc_cols, orc_rows = canon(orc)
        schema_ok = sp_cols == orc_cols
        rows_ok = len(sp_rows) == len(orc_rows)
        hash_ok = schema_ok and rows_ok and sp_rows == orc_rows
        ok = schema_ok and rows_ok and hash_ok
        if not ok:
            fails += 1
            detail = f" spark_cols={sp_cols} oracle_cols={orc_cols}" if not schema_ok else ""
            print(f"{name}: FAIL rows={len(sp_rows)}/{len(orc_rows)} "
                  f"schema={schema_ok} values={hash_ok}{detail}", flush=True)
            if schema_ok and rows_ok and not hash_ok:
                diff = [(a, b) for a, b in zip(sp_rows, orc_rows) if a != b][:3]
                for a, b in diff:
                    print(f"  spark={a}\n  orcle={b}", flush=True)
        else:
            print(f"{name}: PASS rows={len(sp_rows)}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
