#!/usr/bin/env python3
"""Exact candidate-front size of the banded embedding near-dup gates.

For each LSH table (a group of sign-hyperplanes), every vector lands in
the bucket whose bit i is sign(v . plane_i); the banded pair front is
sum over tables and buckets of C(occupancy, 2) — the number of candidate
pairs the equi-join generates BEFORE exact-cosine verification. This is
the quantity whose growth decides whether a banded layout is in its
linear or quadratic regime, and it is computable in seconds at any scale
where actually RUNNING the pair join would take hours: the evidence the
sf3->sf10 decade uses for the deliberately-tiny anchor gate
(emb_near_dup_banded, 2 tables x 3 planes = 8-value buckets) whose wall
clock is off the chart by construction.

Planes replicate graft.operators.Ann.hashPlanes (Knuth multiplicative
hash, recentered) and quantization replicates Ann.quantize; both are
pure integer formulas, so the front counted here is exactly the front
the Spark operator generates.

Usage: python3 tools/banded_front.py <sfDir> <nPlanes> <tables>
  e.g. banded_front.py /tmp/graft_sf10 6 2    (the anchor: 2x3 planes)
       banded_front.py /tmp/graft_sf10 20 2   (the scaled gate: 2x10)
"""
import sys

import duckdb


def planes(n_planes: int, dim: int):
    return [[((2654435761 * (i * dim + j + 1)) & 0xFFFFFFFF) - (1 << 31)
             for j in range(dim)] for i in range(n_planes)]


def main(sf_dir: str, n_planes: int, tables: int) -> None:
    per_table = n_planes // tables
    ps = planes(n_planes, 64)
    con = duckdb.connect()
    import os
    p = f"{sf_dir}/embeddings.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    total = 0
    for t in range(tables):
        bits = []
        for i in range(per_table):
            lits = "[" + ", ".join(map(str, ps[t * per_table + i])) + "]"
            bits.append(f"(CASE WHEN CAST(list_dot_product(qv, {lits}) AS BIGINT)"
                        f" >= 0 THEN {1 << i} ELSE 0 END)")
        bucket = "(" + " + ".join(bits) + ")"
        rows = con.sql(f"""
            WITH q AS (SELECT list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
                       FROM {src}),
            b AS (SELECT {bucket} AS bucket FROM q),
            o AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY 1)
            SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT), COUNT(*), MAX(n) FROM o
        """).fetchone()
        print(f"table {t}: front={rows[0]:,} buckets={rows[1]} max_occ={rows[2]:,}")
        total += rows[0]
    print(f"TOTAL candidate front ({tables}x{per_table} planes): {total:,}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
