#!/usr/bin/env python3
"""Merge solo-measured queries into a bench artifact.

Usage: python3 tools/merge_bench.py base.json solo.json out.json ["note"]

The per-round protocol for keeping a bench snapshot current when a
query lands after the main run: measure the newcomers SOLO with the
same config (graft.Bench, identical runs/warmup discipline), then merge
their medians/spreads into the main artifact instead of re-running the
whole suite. The merged file records what was measured solo in `notes`
(appending to any existing note), keeps every other field from `base`,
and recomputes `value` as the sum of the merged per-query medians.
"""
import json
import sys


def main(base_p, solo_p, out_p, note=""):
    base = json.load(open(base_p))
    solo = json.load(open(solo_p))
    merged_names = sorted(solo["queries"])
    base["queries"].update(solo["queries"])
    base.setdefault("spread", {}).update(solo.get("spread", {}))
    base.setdefault("errors", {}).update(solo.get("errors", {}))
    base["value"] = sum(base["queries"].values())
    tag = f"solo-measured and merged: {', '.join(merged_names)}"
    if note:
        tag += f" ({note})"
    base["notes"] = (base.get("notes", "") + "; " if base.get("notes") else "") + tag
    with open(out_p, "w") as f:
        json.dump(base, f)
        f.write("\n")
    print(f"merged {len(merged_names)} queries -> {out_p}: "
          f"{len(base['queries'])} total, {base['value']:.1f}s")


if __name__ == "__main__":
    main(*sys.argv[1:5])
