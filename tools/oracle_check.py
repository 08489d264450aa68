"""Driver-like harness: run every queries() entry on Spark AND its DuckDB
oracle at a given sf dir; compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    import datetime
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


_DUCK_TO_SPARK = {
    "BIGINT": "bigint", "INTEGER": "int", "SMALLINT": "smallint",
    "TINYINT": "tinyint", "DOUBLE": "double", "FLOAT": "float",
    "VARCHAR": "string", "BOOLEAN": "boolean", "DATE": "date",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "UBIGINT": None, "HUGEINT": None,  # None = no Spark analogue → FAIL
}


def type_mismatches(spark_schema, o_cols, o_types):
    """Columns whose DuckDB type wouldn't canonicalize to the Spark type.

    The driver's hasher is type-aware (round-1 sessionize failed there on a
    DuckDB HUGEINT vs Spark BIGINT even though the VALUES matched), so flag
    any oracle output column whose type widens past its Spark counterpart.
    Unknown/complex DuckDB types are skipped (arrays/structs compare by
    value anyway)."""
    spark_types = {f.name: f.dataType.simpleString()
                   for f in spark_schema.fields}
    bad = []
    for c, t in zip(o_cols, o_types):
        ts = str(t).upper()
        if ts.startswith("DECIMAL"):
            mapped = ts.lower()
        elif ts in _DUCK_TO_SPARK:
            mapped = _DUCK_TO_SPARK[ts]
        else:
            continue  # complex/unknown type: value hash still guards it
        st = spark_types.get(c)
        if st is None:
            continue  # column-name mismatch reported separately
        if st == "timestamp_ntz":
            st = "timestamp"
        if mapped != st:
            bad.append(f"{c}: duckdb {ts} vs spark {st}")
    return bad


_COMPLEX_SPARK_TYPES = ("array<", "map<", "struct<")


def complex_output_columns(spark_schema):
    """Columns the DRIVER's pandas hasher cannot canonicalize.

    The grading driver sorts result rows via pandas ``sort_values``;
    array/map/struct cells raise ``TypeError: unhashable type`` there
    (CORRECTNESS_r03 media_features_golden). This repo's harness
    string-canonicalizes first and so HIDES the class — reject it
    outright instead: every registered query must emit scalar columns
    only (posexplode vectors, to_json structs)."""
    return [f"{f.name}: {f.dataType.simpleString()}"
            for f in spark_schema.fields
            if f.dataType.simpleString().startswith(_COMPLEX_SPARK_TYPES)]


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from osmpbf_spark.session import get_spark
    spark = get_spark("oracle-check", master="local[8]",
                      shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    # The grading driver records at most 50 queries (CORRECTNESS_r03 had
    # 50 rows for 51 registered — ann_lsh_topk silently got no row).
    # Gate the registry size so an overflow can't ship unnoticed.
    if len(qs) > 50:
        print(f"FAIL  registry has {len(qs)} queries (> driver cap of 50); "
              f"fold or retire entries")
        failures.append("_registry_size")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            schema = df.schema
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name:28s} spark error: {str(e)[:200]}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        cplx = complex_output_columns(schema)
        if cplx:
            print(f"FAIL  {name:28s} non-scalar output columns "
                  f"(driver hasher can't canonicalize): {cplx}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name:28s} rows={len(rows)} (no oracle) "
                  f"[{spark_s:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            o_cols = rel.columns
            o_types = rel.types
            o_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name:28s} duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        ok_cols = sorted(cols) == sorted(o_cols)
        ok_rows = len(rows) == len(o_rows)
        h1 = value_hash(cols, rows)
        h2 = value_hash(o_cols, o_rows)
        tdiff = type_mismatches(schema, o_cols, o_types)
        ok = ok_cols and ok_rows and h1 == h2 and not tdiff
        status = "OK  " if ok else "FAIL"
        print(f"{status}  {name:28s} rows={len(rows)}/{len(o_rows)} "
              f"cols={'=' if ok_cols else cols} hash={'=' if h1 == h2 else (h1, h2)} "
              f"types={'=' if not tdiff else tdiff} "
              f"[{spark_s:.1f}s]")
        if not ok:
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(cols)}")
                print(f"      duck  cols: {sorted(o_cols)}")
            # show first differing lines
            order1 = sorted(range(len(cols)), key=lambda i: cols[i])
            order2 = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            s1 = sorted("|".join(_canon(r[i]) for i in order1) for r in rows)
            s2 = sorted("|".join(_canon(r[i]) for i in order2) for r in o_rows)
            for a, b in zip(s1[:2000], s2[:2000]):
                if a != b:
                    print(f"      spark: {a[:160]}")
                    print(f"      duck : {b[:160]}")
                    break
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
