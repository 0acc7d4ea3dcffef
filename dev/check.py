#!/usr/bin/env python3
"""Dev-loop correctness check, mimicking the driver's t2 oracle gate.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>

Loads each SparkEntry query result (parquet written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same source
tables, and diffs the two relations as multisets (columns sorted by name).
NOT part of the engine: development tooling only (the engine is Scala/Spark).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.sql(sql)
            cols = sorted(oracle.columns)
            collist = ", ".join(f'"{c}"' for c in cols)
            con.sql(f"CREATE OR REPLACE VIEW oracle_q AS SELECT {collist} FROM oracle")
            con.sql(f"CREATE OR REPLACE VIEW spark_q AS SELECT {collist} "
                    f"FROM read_parquet('{out_dir}/{name}/*.parquet')")
            n_o = con.sql("SELECT count(*) FROM oracle_q").fetchone()[0]
            n_s = con.sql("SELECT count(*) FROM spark_q").fetchone()[0]
            extra = con.sql("SELECT * FROM spark_q EXCEPT ALL SELECT * FROM oracle_q")
            missing = con.sql("SELECT * FROM oracle_q EXCEPT ALL SELECT * FROM spark_q")
            n_extra, n_missing = len(extra.fetchall()), len(missing.fetchall())
            if n_o == n_s and n_extra == 0 and n_missing == 0:
                print(f"PASS  {name}  rows={n_s}")
            else:
                failures += 1
                print(f"FAIL  {name}  spark={n_s} oracle={n_o} "
                      f"extra={n_extra} missing={n_missing}")
                if n_extra:
                    print("  spark-only sample:")
                    print(con.sql("SELECT * FROM spark_q EXCEPT ALL SELECT * "
                                  "FROM oracle_q LIMIT 3").to_df().to_string()[:2000])
                if n_missing:
                    print("  oracle-only sample:")
                    print(con.sql("SELECT * FROM oracle_q EXCEPT ALL SELECT * "
                                  "FROM spark_q LIMIT 3").to_df().to_string()[:2000])
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"ERROR {name}: {exc}")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
