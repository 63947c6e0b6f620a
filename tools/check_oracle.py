"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
with the matching ``oracle_sql()`` through DuckDB: row count, schema
(column names, sorted), and an order-insensitive exact value comparison.
Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --json GATE_r10.json [sf_dir] [query ...]

``--json PATH`` additionally writes the per-query record (status, rows,
spark seconds) as a JSON artifact — the round's committed gate evidence
for the catalogue queries outside the driver's fixed 50 slots.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

import json

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def main() -> int:
    import __spark_entry__ as entry_mod
    from vectordb_retrieval_spark.session import get_spark

    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json PATH] [sf_dir] [query ...]")
            return 2
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record[name] = {"status": "fail", "err": f"spark error: {e}"[:300]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(got)} rows ({t_spark:.1f}s)")
            record[name] = {
                "status": "rows_only" if len(got) else "fail",
                "rows": len(got),
                "spark_s": round(t_spark, 2),
            }
            if len(got) == 0:
                failures.append(name)
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record[name] = {"status": "fail", "err": f"duckdb error: {e}"[:300]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, w = normalize(got), normalize(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} vs {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"schema {list(g.columns)} vs {list(w.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status.append(f"values differ: {str(e)[:300]}")
        if status:
            failures.append(name)
            record[name] = {
                "status": "fail",
                "err": "; ".join(status)[:300],
                "rows": len(g),
                "spark_s": round(t_spark, 2),
            }
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            record[name] = {
                "status": "pass",
                "rows": len(g),
                "spark_s": round(t_spark, 2),
            }
            print(f"PASS {name}: {len(g)} rows ({t_spark:.1f}s spark)")
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    if json_path:
        summary = {
            "sf_dir": sf_dir,
            "n_run": n_run,
            "n_passed": n_run - len(failures),
            "failures": failures,
            "queries": record,
        }
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
