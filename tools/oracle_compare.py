import duckdb, json, sys, glob, os
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_sf001'
con = duckdb.connect()
for t in ['documents','embeddings','events']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
names = sorted(os.path.basename(d) for d in glob.glob(f'{out}/*') if os.path.isdir(d))
fails = []
for name in names:
    spark_rel = con.sql(f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')")
    scols = sorted(spark_rel.columns)
    srows = len(spark_rel.fetchall())
    if name not in oracle:
        print(f"{name:28s} no_oracle rows={srows}")
        continue
    try:
        orel = con.sql(oracle[name])
        ocols = sorted(orel.columns)
        orows_data = orel.fetchall()
    except Exception as e:
        fails.append(name); print(f"{name:28s} ORACLE ERR: {str(e)[:150]}"); continue
    # driver-style: sort columns by name, sort rows, compare values
    def canon(rel, cols):
        q = rel.project(', '.join(f'"{c}"' for c in cols))
        rows = sorted(tuple(str(x) for x in r) for r in q.fetchall())
        return rows
    s = canon(spark_rel, scols); o = canon(orel, ocols)
    ok = (scols == ocols) and (s == o)
    status = 'OK  ' if ok else 'FAIL'
    if not ok: fails.append(name)
    print(f"{name:28s} {status} spark={len(s)} oracle={len(o)} cols {scols==ocols}")
    if not ok and len(s) == len(o):
        diff = [(a,b) for a,b in zip(s,o) if a!=b][:2]
        for a,b in diff: print("   spark:", a, "\n   orcl :", b)
print("FAILS:", fails)
