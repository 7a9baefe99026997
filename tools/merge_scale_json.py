#!/usr/bin/env python3
"""Merge family rows from a filtered ScaleBench run into a committed
BENCH_sf*.json (dev tool — ScaleBench itself always writes a complete
file; a SPARK_GRAFT_FAMILIES-filtered run produces only the named
families, which this script folds into the existing file's `families`
map, leaving `balance` and any other sections from the NEWER run in
place only when the older file lacks them).

Usage: python3 tools/merge_scale_json.py BENCH_sf3.json /tmp/graph_sf3.json
"""
import json
import sys


def main(base_path: str, add_path: str) -> None:
    with open(base_path) as f:
        base = json.load(f)
    with open(add_path) as f:
        add = json.load(f)
    base.setdefault("families", {}).update(add.get("families", {}))
    for k, v in add.items():
        if k != "families" and k not in base:
            base[k] = v
    with open(base_path, "w") as f:
        json.dump(base, f)
    print(f"merged {sorted(add.get('families', {}).keys())} into {base_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
