#!/usr/bin/env python3
"""Emit the SCALING_r06 degradation tables from interleaved Bench records,
so doc and record cannot diverge (judge r5 item 7).

Usage: tools/degrade_table.py <baseA_p1.json> <baseA_p2.json> \
                              <armB_p1.json> <armB_p2.json> [--spill]

Per query: takes the MIN across the two passes inside each arm (each
pass value is already a 3-rep median from Bench), prints a markdown
table sorted by B/A time ratio descending. --spill adds arm-B spill
bytes (max across passes — spill is evidence, take the pass that hit it).
Totals, error counts and nonzero-spill query count are printed after.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[0])


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_spill = "--spill" in sys.argv
    a1, a2, b1, b2 = (load(p) for p in args)
    qs = set(a1["queries"]) & set(a2["queries"]) & set(b1["queries"]) & set(b2["queries"])
    amin = {q: min(a1["queries"][q], a2["queries"][q]) for q in qs}
    bmin = {q: min(b1["queries"][q], b2["queries"][q]) for q in qs}
    spill = {q: max(b1.get("spillBytes", {}).get(q, 0),
                    b2.get("spillBytes", {}).get(q, 0)) for q in qs}
    hdr = "| query | base | constrained | ratio |"
    sep = "|---|---|---|---|"
    if show_spill:
        hdr = hdr + " spill |"
        sep += "---|"
    print(hdr)
    print(sep)
    for q in sorted(qs, key=lambda q: bmin[q] / amin[q], reverse=True):
        row = f"| {q} | {amin[q]:.2f} | {bmin[q]:.2f} | {bmin[q]/amin[q]:.2f} |"
        if show_spill:
            mb = spill[q] / 1e6
            row += f" {mb:,.0f} MB |" if mb >= 1 else " 0 |"
        print(row)
    ta, tb = sum(amin.values()), sum(bmin.values())
    errs = sum(len(r.get("errors", {})) for r in (a1, a2, b1, b2))
    nspill = sum(1 for q in qs if spill[q] > 0)
    tots = f"\ntotals: base {ta:.1f}s, constrained {tb:.1f}s ({tb/ta:.2f}x); " \
           f"errors across all passes: {errs}"
    if show_spill:
        tots += f"; queries with nonzero spill: {nspill}, " \
                f"total spill {sum(spill.values())/1e9:.2f} GB"
    print(tots)


if __name__ == "__main__":
    main()
