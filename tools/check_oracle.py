#!/usr/bin/env python3
"""Local (dev-only) mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf parquet tables,
and compares schemas + values exactly (rows sorted by all columns).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        c = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    c.append("NaN")
                else:
                    c.append(repr(v))
            else:
                c.append(str(v))
        out.append(tuple(c))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            # Round-1 lesson: the driver renders one side's decimals via
            # float, so ANY decimal output column is hash-unsafe (trailing
            # zeros). Fail loudly here so it never reaches the driver.
            dec_cols = [c for c, t in zip(got.columns, got.types)
                        if "DECIMAL" in str(t).upper()]
            if dec_cols:
                print(f"FAIL {name}: DECIMAL output columns {dec_cols} "
                      "(driver-unsafe; cast to DOUBLE)")
                n_fail += 1
                continue
            got_cols = sorted(got.columns)
            got_rows = canon(
                con.sql(
                    f"SELECT {', '.join(got_cols)} FROM "
                    f"'{out_dir}/{name}/*.parquet'").fetchall())
            exp = con.sql(sql)
            # Round-2 lesson (q30): DuckDB sum(BIGINT) widens to HUGEINT,
            # which the driver renders differently from Spark's BIGINT
            # even for equal values. DECIMAL on the oracle side is the
            # same trailing-zero hazard as on the Spark side.
            bad_types = [c for c, t in zip(exp.columns, exp.types)
                         if any(k in str(t).upper()
                                for k in ("DECIMAL", "HUGEINT"))]
            if bad_types:
                print(f"FAIL {name}: oracle columns {bad_types} are "
                      "DECIMAL/HUGEINT (driver-unsafe; CAST to "
                      "BIGINT/DOUBLE in the oracle SQL)")
                n_fail += 1
                continue
            exp_cols = sorted(exp.columns)
            exp_rows = canon(
                con.sql(
                    f"SELECT {', '.join(exp_cols)} FROM ({sql})").fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
        elif got_rows != exp_rows:
            bad = next(i for i, (a, b) in enumerate(zip(got_rows, exp_rows))
                       if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"  spark : {got_rows[bad]}")
            print(f"  duckdb: {exp_rows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
