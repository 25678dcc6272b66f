#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
scale-factor parquet tables, loads the Spark result parquet the Verify
main wrote, sorts columns by name and rows by value, and compares.

Usage: python3 scripts/check_oracle.py <sfdir> <outdir>
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def described_types(con, sql):
    """Column name -> DuckDB type for a query, via DESCRIBE."""
    rows = con.sql(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def type_mismatches(otypes, stypes):
    """Oracle-vs-Spark DuckDB type divergences that change the driver's
    typed hash. The driver hashes the *typed* frames, so an oracle column
    that DESCRIBEs differently from the Spark parquet column (e.g. an
    uncast SUM() widening to HUGEINT, rendered `494.0` vs the parquet's
    BIGINT `494`) passes a Python-value compare but fails the driver.
    Compare DESCRIBE output exactly per column name."""
    bad = []
    for c in sorted(set(otypes) | set(stypes)):
        ot, st = otypes.get(c), stypes.get(c)
        if ot != st:
            bad.append((c, ot, st))
    return bad


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [c for c in sorted(cols)], out


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_sql = f"SELECT * FROM '{outdir}/{name}/*.parquet'"
            tbad = type_mismatches(described_types(con, f"({sql})"),
                                   described_types(con, f"({spark_sql})"))
            o = con.sql(sql)
            ocols, orows = list(o.columns), o.fetchall()
            s = con.sql(spark_sql)
            scols, srows = list(s.columns), s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if tbad:
            detail = ", ".join(f"{c}: oracle={ot} spark={st}"
                               for c, ot, st in tbad)
            print(f"FAIL {name}: type mismatch ({detail})")
            n_fail += 1
            continue
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns oracle={oc} spark={sc}")
            n_fail += 1
            continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: rows oracle={len(orr)} spark={len(srr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(orr, srr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: oracle={bad[0][0]} spark={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orr)} rows)")
            n_pass += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
