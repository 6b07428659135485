"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf_dir, runs the
matching oracle_sql() in DuckDB over the same parquet files, and
compares row count, column names, and order-insensitive value
multiset. Use while iterating:

    python tools/verify_local.py [sf_dir] [query ...]

Flags: --strict for bitwise float comparison; --driver-canon to ALSO
replicate the external driver's pandas sort_values canonicalization
(catches output-shape hazards — raw array columns, HUGEINT→float —
that the tuple comparison tolerates).
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from real_time_event_streaming_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


STRICT = False


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if STRICT:
            return repr(v)  # bitwise: any ulp difference fails
        # tolerant mode: round to 6 significant-ish decimals
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def df_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return out


def driver_canon_check(name, srows, scols, con, sql):
    """Replicate the external driver's pandas-based canonicalization
    (CORRECTNESS gate): load both sides into pandas, sort_values over
    all columns, hash stringified rows. This is the exact path that
    ERRed on a raw array column and float-ified DuckDB HUGEINTs in
    round 2 — running it locally catches output-shape hazards that the
    tuple-multiset comparison above tolerates. Returns None if OK, else
    a problem string."""
    import pandas as pd

    try:
        odf = con.sql(sql).df()
        sdf = pd.DataFrame(srows, columns=scols)
        cols = sorted(scols)
        sc = sdf[cols].sort_values(by=cols, ignore_index=True)
        oc = odf[cols].sort_values(by=cols, ignore_index=True)
    except Exception as e:  # the r2 llm_emb_quantize failure mode
        return f"driver-canon raised {type(e).__name__}: {e}"
    def cell(v):
        # null spellings unify: Spark collect yields None (object
        # dtype), duckdb .df() yields NaN/NaT — the real driver's
        # canon treats them as equal (fn_try_arith was driver-green
        # with nulls in r2), so this replica must too
        return "NULL" if v is None or v != v or str(v) == "NaT" else str(v)

    sh = [tuple(cell(v) for v in r) for r in sc.itertuples(index=False)]
    oh = [tuple(cell(v) for v in r) for r in oc.itertuples(index=False)]
    if sh != oh:
        diffs = [(a, b) for a, b in zip(sh, oh) if a != b][:2]
        return f"driver-canon mismatch (pandas dtypes spark={list(sc.dtypes)} duck={list(oc.dtypes)}), first: {diffs}"
    return None


def main():
    global STRICT
    args = [a for a in sys.argv[1:] if a not in ("--strict", "--driver-canon")]
    STRICT = "--strict" in sys.argv
    driver_canon = "--driver-canon" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    import os

    for t in TABLES:
        # partial corpora (the /tmp soak dirs carry only documents +
        # embeddings) still verify the queries whose tables exist
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # a few oracles (IVF/PQ ANN, semdedup) inline trained literals
    # derived from the data itself; thread the sf under test to their
    # generators EXPLICITLY (the ambient env var remains only as the
    # fallback for the fixed driver contract — r7 ADVICE, low)
    from real_time_event_streaming_pipeline_spark import plans

    qs, oracles = entrymod.queries(), plans.all_oracles(sf_dir=sf_dir)
    for dq, reason in plans.DEGRADED_ORACLES.items():
        print(f"DEGRADED  {dq}: oracle generator degraded to rows-only ({reason})")
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(srows) >= 0
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            sm, om = df_multiset(srows, scols), df_multiset(orows, ocols)
            if sm != om:
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if not problems and driver_canon:
            p = driver_canon_check(name, srows, scols, con, oracles[name])
            if p:
                problems.append(p)
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
