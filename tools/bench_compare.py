#!/usr/bin/env python3
"""Compare two BENCH_DETAILS.json files query-by-query.

Usage: bench_compare.py <baseline.json> <candidate.json> [threshold]

Prints the common-query median/mean ratio (candidate/baseline min_s),
section sums over common queries, and the movers beyond the threshold
(default 1.3x either way). This is the round-over-round noise-floor gate
the r6 verdict asked for: a uniform median drift means harness trouble,
isolated movers mean per-query causes to pin.
"""
import json
import statistics
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))["queries"]
    cand = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(base) & set(cand))
    ratios = {}
    for q in common:
        b, c = base[q]["min_s"], cand[q]["min_s"]
        if b > 0:
            ratios[q] = c / b
    # degenerate inputs (disjoint query sets, all-zero baseline) must fail
    # loudly, not crash in median()/zero-division
    if not ratios or sum(base[q]["min_s"] for q in common) <= 0:
        print(f"no comparable queries (common={len(common)}, "
              f"nonzero-baseline={len(ratios)})")
        sys.exit(2)
    med = statistics.median(ratios.values())
    mean = statistics.fmean(ratios.values())
    bsum = sum(base[q]["min_s"] for q in common)
    csum = sum(cand[q]["min_s"] for q in common)
    print(f"common queries: {len(common)}  (baseline-only: "
          f"{len(set(base) - set(cand))}, candidate-only: {len(set(cand) - set(base))})")
    print(f"median ratio: {med:.3f}   mean ratio: {mean:.3f}")
    print(f"common-sum: {bsum:.1f}s -> {csum:.1f}s  (x{csum / bsum:.3f})")
    # weight the headline by time: tiny queries swing ratios hardest
    big = [q for q in common if base[q]["min_s"] >= 0.5]
    if big:
        bmed = statistics.median(ratios[q] for q in big if q in ratios)
        print(f"median ratio over >=0.5s queries ({len(big)}): {bmed:.3f}")
    movers = sorted((r, q) for q, r in ratios.items()
                    if r > thr or r < 1 / thr)
    if movers:
        print(f"movers beyond x{thr} ({len(movers)}):")
        for r, q in movers:
            print(f"  {q:45s} {base[q]['min_s']:8.3f} -> "
                  f"{cand[q]['min_s']:8.3f}  x{r:.2f}")
    else:
        print(f"no movers beyond x{thr}")


if __name__ == "__main__":
    main()
