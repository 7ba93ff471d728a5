#!/usr/bin/env python3
"""Quantify a value-level gate divergence: for each named query, replay
the oracle in DuckDB and compare the Spark dump cell-by-cell (sorted
columns, sorted rows), reporting per-column max |abs| and relative error
and the count of differing cells — the evidence SCALING.md records when
a float-limit FAIL is classified as quantified-inherent rather than
fixed.

Usage: python3 tools/diff_quantify.py <sfdir> query [query ...]
(expects the dump dir tools/check.py uses for that sfdir)
"""
import json, math, os, sys

SF = sys.argv[1]
names = sys.argv[2:]
OUT = '/tmp/graft_verify_' + SF.strip('/').replace('/', '_')

import duckdb
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    src = f'{SF}/{t}.parquet'
    if os.path.isdir(src):
        src = f'{src}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f'{OUT}/oracle_sql.json'))

for name in names:
    exp = con.execute(oracle[name]).arrow().to_pandas()
    got = con.execute(
        f"SELECT * FROM '{OUT}/{name}/*.parquet'").arrow().to_pandas()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if len(exp) != len(got):
        print(f'{name}: ROW COUNT exp={len(exp)} got={len(got)}')
        continue
    # align on the same canonical order check.py sorts by
    key = list(exp.columns)
    exp = exp.sort_values(key, ignore_index=True)
    got = got.sort_values(key, ignore_index=True)
    print(f'{name}: {len(exp)} rows')
    for c in exp.columns:
        e, g = exp[c], got[c]
        try:
            ef = e.astype('float64'); gf = g.astype('float64')
        except (ValueError, TypeError):
            ndiff = int((e.astype(str) != g.astype(str)).sum())
            if ndiff:
                print(f'  {c}: {ndiff} differing cells (non-numeric)')
            continue
        d = (ef - gf).abs()
        ndiff = int((d > 0).sum())
        if not ndiff:
            continue
        rel = (d / ef.abs().clip(lower=1e-300)).max()
        mag = ef.abs().max()
        print(f'  {c}: {ndiff}/{len(e)} cells differ, '
              f'max |abs|={d.max():.6g}, max rel={rel:.3g}, '
              f'col magnitude~{mag:.3g}')
