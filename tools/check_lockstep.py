#!/usr/bin/env python3
"""Artifact-lockstep check: every committed artifact must carry exactly
HEAD's query surface.

Usage: python3 tools/check_lockstep.py <verify_out_dir>

<verify_out_dir> is any graft.Verify output dir (its oracle_sql.json is
the authoritative key set — Verify dumps ALL of SparkEntry.oracleSql
regardless of SPARK_GRAFT_ONLY filtering). The script diffs those keys
against each committed artifact:

  artifacts/ORACLE_sf*.txt          per-query PASS/FAIL lines
  artifacts/BENCH_sf1.json          "queries" map
  artifacts/BASELINE_BENCH_sf0.1.json  "queries" map (perf baseline)

The BASELINE is a frozen snapshot by design (Bench.scala gives queries
added after the freeze no ratio — they extend the surface, they can't
regress it), so for the baseline only EXTRA keys (queries that no longer
exist at HEAD, whose ratios would compare against nothing) mark it
stale; missing-new-queries are reported informationally and stay IN
SYNC. The per-round ORACLE/BENCH artifacts must match the surface
exactly in both directions.

Exit 0 only when every artifact present is IN SYNC. Run this as part of
the bench/oracle refresh protocol — two rounds (r9, r10) shipped
one-query-stale sf1 artifacts before this check existed.
"""
import json, os, re, sys, glob

def oracle_txt_keys(path):
    keys = set()
    for line in open(path):
        m = re.match(r"^(\S+)\s+(PASS|FAIL|MISSING)", line)
        if m and m.group(1) != "ALL":  # skip the "ALL PASS" summary line
            keys.add(m.group(1))
    return keys

def main(out_dir):
    head = set(json.load(open(os.path.join(out_dir, "oracle_sql.json"))))
    print(f"HEAD query surface: {len(head)} queries (from {out_dir}/oracle_sql.json)")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = []
    for p in sorted(glob.glob(os.path.join(repo, "artifacts", "ORACLE_sf*.txt"))):
        targets.append((p, oracle_txt_keys(p), False))
    for name, baseline in (("BENCH_sf1.json", False),
                           ("BASELINE_BENCH_sf0.1.json", True)):
        p = os.path.join(repo, "artifacts", name)
        if os.path.exists(p):
            targets.append((p, set(json.load(open(p))["queries"]), baseline))
    ok = True
    for p, keys, baseline in targets:
        missing = sorted(head - keys)
        extra = sorted(keys - head)
        rel = os.path.relpath(p, repo)
        if baseline and missing and not extra:
            # frozen baseline: new queries simply have no ratio yet
            print(f"  IN SYNC   {rel} ({len(keys)} queries; "
                  f"{len(missing)} newer queries have no baseline ratio: {missing})")
        elif not missing and not extra:
            print(f"  IN SYNC   {rel} ({len(keys)} queries)")
        else:
            ok = False
            print(f"  STALE     {rel}: missing {missing or '-'} extra {extra or '-'}")
    print("LOCKSTEP OK" if ok else "LOCKSTEP BROKEN — refresh the stale artifacts")
    return 0 if ok else 1

if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[3])  # the Usage line
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
