#!/usr/bin/env python3
"""Attribute the r4->r5 sf0.1 bench delta from the interleaved A/B runs.

Usage: tools/ab_attrib.py <dir>   (expects r4_p{1,2}.json,
head_on_p{1,2}.json, head_off_p{1,2}.json written by Bench over the
SAME query set)

Buckets:
  listener  = head_on - head_off          (task-metric listener cost)
  plans     = head_off - r4               (real plan/code deltas, incl.
                                           deliberate scale fixes)
  and a per-query table of the biggest movers in `plans`.
Each total is the mean of the two interleaved passes; per-query values
use the per-pass MEDIANS Bench already computed.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[0])


def tot(rec):
    return sum(v for v in rec["queries"].values() if v >= 0)


def avg_queries(a, b):
    return {q: (a["queries"][q] + b["queries"][q]) / 2
            for q in a["queries"] if a["queries"][q] >= 0 and b["queries"][q] >= 0}


def main():
    d = sys.argv[1]
    r4 = [load(f"{d}/r4_p{p}.json") for p in (1, 2)]
    on = [load(f"{d}/head_on_p{p}.json") for p in (1, 2)]
    off = [load(f"{d}/head_off_p{p}.json") for p in (1, 2)]
    for name, recs in (("r4", r4), ("head_on", on), ("head_off", off)):
        ts = [tot(r) for r in recs]
        errs = set()
        for r in recs:
            errs |= set(r.get("errors", {}))
        print(f"{name:9s} pass totals: {ts[0]:7.2f}s {ts[1]:7.2f}s  "
              f"mean {sum(ts)/2:7.2f}s  errors={sorted(errs) or 'none'}")
    m4, mon, moff = (avg_queries(*r4), avg_queries(*on), avg_queries(*off))
    common = sorted(set(m4) & set(mon) & set(moff))
    t4 = sum(m4[q] for q in common)
    ton = sum(mon[q] for q in common)
    toff = sum(moff[q] for q in common)
    print(f"\ncommon {len(common)} queries: r4 {t4:.2f}s  "
          f"head_on {ton:.2f}s  head_off {toff:.2f}s")
    print(f"listener bucket (on-off):  {ton - toff:+.2f}s")
    print(f"plans bucket    (off-r4):  {toff - t4:+.2f}s")
    movers = sorted(common, key=lambda q: abs(moff[q] - m4[q]), reverse=True)
    print("\n| query | r4 s | head(off) s | delta s | ratio |")
    print("|---|---|---|---|---|")
    for q in movers[:20]:
        dlt = moff[q] - m4[q]
        print(f"| {q} | {m4[q]:.2f} | {moff[q]:.2f} | {dlt:+.2f} | "
              f"{moff[q]/m4[q]:.2f} |")
    drift = sum(dlt for q in common
                if abs(dlt := moff[q] - m4[q]) < 0.1)
    print(f"\nsum of |delta|<0.1s per-query drift: {drift:+.2f}s "
          f"(diffuse noise / environment)")


if __name__ == "__main__":
    main()
