#!/usr/bin/env python3
"""Measure where the literal-replay oracle bridge stops scaling in k.

The dynamicOracles bridge (QueryModule.dynamicOracles; e.g. KMeansOp's
assignCtes) inlines fitted centroids into the DuckDB oracle SQL as array
literals — k * d doubles of SQL text. That is fine at the reference's
operating point (k<=37, d=64) but the SQL itself must eventually become
the bottleneck. This probe measures that point directly:

  for k in 10..10000: build the exact assignCtes-shaped SQL with k
  deterministic pseudo-centroids (d = the real embedding dim) over the
  sf0.01 embeddings table, run it in DuckDB, and record SQL bytes +
  wall time; then run the join-replay FALLBACK (same centroids written
  to a parquet side table, nearest-centroid via join + arg-min) and
  assert both produce identical assignments.

Deterministic: centroids are seeded off (k, cid, dim index) with a
splitmix-style integer hash — no RNG state, same values every run.

Usage: python3 tools/oracle_scale_probe.py [sf_dir] [out_parquet_dir]
Prints one line per (k, variant) with sql_bytes and seconds.
"""
import sys, time, os, tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
D = 64


def h(x: int) -> float:
    """splitmix64-ish -> [-1, 1) double, deterministic."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x = x ^ (x >> 31)
    return (x / 2**63) - 1.0


def centroids(k: int):
    return [[round(h(k * 1_000_003 + c * D + i), 6) for i in range(D)]
            for c in range(k)]


def literal_sql(cen) -> str:
    """The assignCtes shape from KMeansOp, centroids as SQL literals."""
    cenL = "[" + ", ".join(
        "[" + ", ".join(repr(v) for v in row) + "]" for row in cen) + "]"
    return f"""
WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM '{SF}/embeddings.parquet'),
lits AS (SELECT {cenL} AS cen),
cenr AS (SELECT CAST(i - 1 AS BIGINT) AS cid, l.cen[CAST(i AS INT)] AS ce
  FROM lits l CROSS JOIN (SELECT unnest(generate_series(1, {len(cen)})) AS i)),
dst AS (
  SELECT n.vec_id, c.cid, list_inner_product(
      list_transform(generate_series(1, len(n.v)), i -> n.v[i] - c.ce[i]),
      list_transform(generate_series(1, len(n.v)), i -> n.v[i] - c.ce[i])) AS d2
  FROM nv n CROSS JOIN cenr c),
darr AS (SELECT vec_id, list(d2 ORDER BY cid) AS ds FROM dst GROUP BY vec_id),
asg AS (SELECT vec_id, list_position(ds, list_min(ds)) - 1 AS cluster FROM darr)
SELECT cluster, count(*) AS n FROM asg GROUP BY cluster ORDER BY cluster"""


def parquet_sql(path: str) -> str:
    """Fallback: identical arithmetic, centroids from a parquet side table."""
    return f"""
WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM '{SF}/embeddings.parquet'),
cenr AS (SELECT cid, ce FROM '{path}'),
dst AS (
  SELECT n.vec_id, c.cid, list_inner_product(
      list_transform(generate_series(1, len(n.v)), i -> n.v[i] - c.ce[i]),
      list_transform(generate_series(1, len(n.v)), i -> n.v[i] - c.ce[i])) AS d2
  FROM nv n CROSS JOIN cenr c),
darr AS (SELECT vec_id, list(d2 ORDER BY cid) AS ds FROM dst GROUP BY vec_id),
asg AS (SELECT vec_id, list_position(ds, list_min(ds)) - 1 AS cluster FROM darr)
SELECT cluster, count(*) AS n FROM asg GROUP BY cluster ORDER BY cluster"""


def main():
    print(f"probe over {SF}/embeddings.parquet, d={D}")
    tmp = tempfile.mkdtemp(prefix="oracle_scale_probe")
    for k in (10, 100, 1000, 3000, 10000):
        cen = centroids(k)
        sql = literal_sql(cen)
        t0 = time.time()
        lit_rows = duckdb.sql(sql).fetchall()
        lit_s = time.time() - t0

        path = os.path.join(tmp, f"cen_{k}.parquet")
        pq.write_table(pa.table({
            "cid": pa.array(range(k), pa.int64()),
            "ce": pa.array(cen, pa.list_(pa.float64()))}), path)
        t0 = time.time()
        pq_rows = duckdb.sql(parquet_sql(path)).fetchall()
        pq_s = time.time() - t0

        agree = lit_rows == pq_rows
        print(f"k={k:6d} sql={len(sql):>9,d} B  literal={lit_s:6.2f} s  "
              f"parquet={pq_s:6.2f} s  agree={agree}")
        if not agree:
            sys.exit(f"MISMATCH at k={k}")


if __name__ == "__main__":
    main()
