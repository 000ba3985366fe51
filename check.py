#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 check.py <outDir> <sfDir> [--oracle-budget-sec=N] [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views over
<sfDir>/*.parquet, and compares sorted rows (columns sorted by name).

Every PASS/FAIL line carries the oracle's DuckDB wall time, and the run
ends with the slowest-oracle table: the round-13..16 CORRECTNESS
artifacts shipped EMPTY because a handful of oracles cost minutes each
(q_dedup_semantic alone was 384 s before CTE materialization), which no
driver-side comparer budget survives. --oracle-budget-sec (default 5.0)
turns any slower oracle into a FAIL so an expensive one can never land
silently again; pass --oracle-budget-sec=none to disable.
"""
import sys, os, json, math, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    budget = 5.0
    for f in flags:
        if f.startswith("--oracle-budget-sec="):
            v = f.split("=", 1)[1]
            budget = None if v == "none" else float(v)
        else:
            sys.exit(f"unknown flag {f}")
    out_dir, sf_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    times = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        if name not in oracle:
            n_rows = con.execute(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"SKIP  {name}: no oracle (rows={n_rows})")
            n_skip += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
            t0 = time.monotonic()
            duck_df = con.execute(oracle[name]).fetch_arrow_table()
            times[name] = time.monotonic() - t0
            if budget is not None and times[name] > budget:
                print(f"FAIL  {name}: oracle took {times[name]:.1f}s "
                      f"(budget {budget}s) — a slow oracle kills the "
                      "driver's comparer; restructure the SQL")
                n_fail += 1
                continue
            s_cols = sorted(spark_df.column_names)
            d_cols = sorted(duck_df.column_names)
            if s_cols != d_cols:
                print(f"FAIL  {name}: columns differ spark={s_cols} duck={d_cols}")
                n_fail += 1
                continue
            s_types = {c: str(spark_df.schema.field(c).type) for c in s_cols}
            d_types = {c: str(duck_df.schema.field(c).type) for c in d_cols}
            for c in s_cols:
                if s_types[c] != d_types[c]:
                    print(f"WARN  {name}: col {c} type spark={s_types[c]} duck={d_types[c]}")
            s_rows = sorted([tuple(norm(v) for v in r) for r in
                             zip(*[spark_df.column(c).to_pylist() for c in s_cols])],
                            key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
            d_rows = sorted([tuple(norm(v) for v in r) for r in
                             zip(*[duck_df.column(c).to_pylist() for c in d_cols])],
                            key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
            if len(s_rows) != len(d_rows):
                print(f"FAIL  {name}: row count spark={len(s_rows)} duck={len(d_rows)}")
                n_fail += 1
                continue
            bad = None
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    bad = (i, a, b)
                    break
            if bad:
                i, a, b = bad
                print(f"FAIL  {name}: first diff at sorted row {i}:")
                print(f"      spark: {a}")
                print(f"      duck : {b}")
                for x, y, c in zip(a, b, s_cols):
                    if x != y:
                        print(f"      col {c}: {x!r} vs {y!r}")
                n_fail += 1
            else:
                print(f"PASS  {name} ({len(s_rows)} rows) [{times[name]:.2f}s oracle]")
                n_pass += 1
        except Exception as e:
            print(f"FAIL  {name}: exception {str(e)[:300]}")
            n_fail += 1
    if times:
        slow = sorted(times.items(), key=lambda x: -x[1])[:5]
        total = sum(times.values())
        print(f"\noracle wall {total:.1f}s; slowest: "
              + ", ".join(f"{n} {t:.2f}s" for n, t in slow))
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
