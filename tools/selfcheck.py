#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching oracle SQL from oracle_sql.json in DuckDB against the parquet
tables in <sfDir>. Compares row count, column names, and values
(columns sorted by name, rows sorted canonically).
"""
import sys, os, json, glob, tempfile
import duckdb

# DuckDB types the driver's hasher encodes differently from anything Spark
# can emit, even when values are numerically equal. sum(BIGINT) in DuckDB
# returns HUGEINT (int128); the driver hashes the typed value, so a
# numerically-equal int64 from Spark still hash-mismatches. repr()-based
# value compare can't see this, so flag the type itself.
BAD_ORACLE_TYPES = ('HUGEINT', 'UHUGEINT')


def hugeint_cols(rel):
    return [c for c, t in zip(rel.columns, rel.types)
            if str(t).upper() in BAD_ORACLE_TYPES]


def canon(rows, cols):
    # NOTE: floats are compared EXACTLY (repr), matching the driver's
    # value-hash — a 1-ulp round() divergence between Spark and DuckDB is
    # a real failure there, so it must be one here too.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            vals.append(repr(r[i]))
        out.append('|'.join(vals))
    out.sort()
    return out


def selftest():
    """Regression: a deliberately-uncast sum (HUGEINT) must FAIL the check,
    even though its values repr-compare equal to Spark's int64 output."""
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as tmp:
        con.sql(f"COPY (SELECT 1::BIGINT AS x) TO '{tmp}/t.parquet'")
        uncast = con.sql("SELECT sum(x) AS s FROM range(3) t(x)")
        cast = con.sql("SELECT sum(x)::BIGINT AS s FROM range(3) t(x)")
        assert hugeint_cols(uncast) == ['s'], \
            f'uncast sum not flagged: types={uncast.types}'
        assert hugeint_cols(cast) == [], \
            f'cast sum wrongly flagged: types={cast.types}'
    print('selftest PASS: uncast sum flagged as HUGEINT, cast sum clean')


def main():
    if sys.argv[1:] == ['--selftest']:
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tbl in ['region','nation','customer','supplier','part','orders',
                'lineitem','events','documents','embeddings']:
        p = f'{sf_dir}/{tbl}.parquet'
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f'{out_dir}/{name}/*.parquet')
        if not spark_files:
            print(f'FAIL {name}: no spark output')
            n_fail += 1
            continue
        try:
            s = con.sql(f"SELECT * FROM read_parquet({spark_files!r})")
            scols, srows = s.columns, s.fetchall()
            d = con.sql(sql)
            dcols, drows = d.columns, d.fetchall()
        except Exception as e:
            print(f'FAIL {name}: {e}')
            n_fail += 1
            continue
        bad = hugeint_cols(d)
        if bad:
            print(f'FAIL {name}: oracle cols {bad} are HUGEINT — the driver '
                  f'hashes int128 differently from Spark int64 even when '
                  f'numerically equal; cast with ::BIGINT in the oracle SQL')
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f'FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}')
            n_fail += 1
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f'FAIL {name}: rows spark={len(cs)} duck={len(cd)} first-diffs={diff}')
            n_fail += 1
        else:
            print(f'PASS {name} ({len(cs)} rows)')
            n_pass += 1
    print(f'== {n_pass} pass, {n_fail} fail ==')
    sys.exit(1 if n_fail else 0)


if __name__ == '__main__':
    main()
