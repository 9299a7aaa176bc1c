#!/usr/bin/env python3
"""Compare two Bench records (small SF vs big SF) and emit a scaling table.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> [data_factor]

data_factor: row-count ratio between the two runs (default 10).
For each query prints t_big, t_small, ratio, shuffle-write ratio and spill,
sorted by time ratio descending; flags ratios above 1.5x the data factor.
A sub-data-factor time ratio is GOOD (fixed costs amortizing); a
super-linear one is a scale bug candidate.
"""
import json
import sys


def load(path):
    with open(path) as f:
        # Bench writes the full record on line 1 and a compact headline
        # summary on line 2; only the full record has per-query maps.
        return json.loads(f.read().strip().splitlines()[0])


def main():
    small = load(sys.argv[1])
    big = load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs = small["queries"]
    qb = big["queries"]
    sw_s = small.get("shuffleWriteBytes", {})
    sw_b = big.get("shuffleWriteBytes", {})
    sp_b = big.get("spillBytes", {})
    common = sorted(set(qs) & set(qb))
    missing = sorted(set(qs) ^ set(qb))
    if missing:
        print(f"WARNING: non-common queries: {missing}", file=sys.stderr)

    rows = []
    for q in common:
        ts, tb = qs[q], qb[q]
        if ts <= 0 or tb <= 0:
            rows.append((float("inf"), q, ts, tb, None, None))
            continue
        ratio = tb / ts
        ws, wb = sw_s.get(q, 0), sw_b.get(q, 0)
        wratio = (wb / ws) if ws > 0 else (None if wb == 0 else float("inf"))
        rows.append((ratio, q, ts, tb, wratio, sp_b.get(q, 0)))
    rows.sort(reverse=True)

    flag_at = 1.5 * factor
    print(f"| query | t_small s | t_big s | time× | shufW× | spill_big MB |")
    print("|---|---|---|---|---|---|")
    nflag = 0
    for ratio, q, ts, tb, wratio, spill in rows:
        flag = " **⚠**" if ratio > flag_at else ""
        if flag:
            nflag += 1
        wr = f"{wratio:.1f}" if wratio not in (None, float("inf")) else (
            "new" if wratio == float("inf") else "-")
        sp = f"{(spill or 0) / 1e6:.0f}" if spill else "0"
        print(f"| {q}{flag} | {ts:.2f} | {tb:.2f} | {ratio:.1f} | {wr} | {sp} |")

    tot_s = sum(v for v in qs.values() if v > 0)
    tot_b = sum(v for v in qb.values() if v > 0)
    spill_tot = sum(v for v in sp_b.values() if v > 0)
    # Scripted headline — paste this into SCALING_r{N}.md verbatim so the
    # doc's counts can never diverge from the records (r5's did: 148 vs 149).
    print(f"\nheadline: {len(qb)} queries ({len(common)} common), "
          f"{len(big.get('errors', {}))} errors at big SF; "
          f"total {tot_s:.1f}s -> {tot_b:.1f}s = {tot_b / tot_s:.2f}x "
          f"at {factor:.0f}x data; {nflag} queries above {flag_at:.0f}x; "
          f"big-SF spill {spill_tot / 1e6:.0f} MB")
    errs = {**{k: v for k, v in small.get("errors", {}).items()},
            **{k: v for k, v in big.get("errors", {}).items()}}
    if errs:
        print(f"ERRORS: {errs}")
        sys.exit(1)


if __name__ == "__main__":
    main()
