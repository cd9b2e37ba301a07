#!/usr/bin/env python3
"""Scale-ratio analysis between two Bench JSON lines (r12 VERDICT #4).

Usage: bench_ratio.py <bench_small.json> <bench_big.json> [growth]

Each input is the one-line `{"metric":...,"queries":{...}}` JSON the
Bench main prints. `growth` is the data-size factor between the two
runs (default 10, the sf0.1 -> sf1 fixture). A query whose time grew
MORE than `growth` is super-linear in data — the scale-killer signal
the local bench can actually measure. Fixed per-query costs (session,
planning, file open) dominate sub-second queries and make their ratios
look sub-linear; only queries with enough signal at the big scale are
flagged (big-run time >= 2 s), everything else is listed for the
record.
"""
import json
import sys


def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {p}")


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    growth = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    # a query missing from EITHER run means it was never measured at
    # that scale — that must fail the gate, not scroll past (r15
    # harness self-review; big-side-only queries were silently ignored)
    missing = sorted(set(qs) - set(qb))
    extra = sorted(set(qb) - set(qs))
    for k in missing:
        print(f"MISSING in big run: {k}")
    for k in extra:
        print(f"MISSING in small run: {k}")
    rows = []
    for k in sorted(set(qs) & set(qb)):
        s, b = float(qs[k]), float(qb[k])
        rows.append((b / s if s > 0 else float("inf"), s, b, k))
    rows.sort(reverse=True)
    flagged = []
    print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query")
    for r, s, b, k in rows:
        mark = ""
        if r > growth and b >= 2.0:
            mark = "  <-- SUPER-LINEAR"
            flagged.append((r, s, b, k))
        print(f"{r:7.2f} {s:8.3f} {b:8.3f}  {k}{mark}")
    ts = sum(q[1] for q in rows)
    tb = sum(q[2] for q in rows)
    print(f"\ntotals: small {ts:.1f} s, big {tb:.1f} s, "
          f"overall ratio {tb / ts:.2f}x (data growth {growth:.0f}x)")
    if flagged:
        print(f"\n{len(flagged)} SUPER-LINEAR quer"
              f"{'y' if len(flagged) == 1 else 'ies'} "
              f"(time grew faster than the data):")
        for r, s, b, k in flagged:
            print(f"  {k}: {s:.2f}s -> {b:.2f}s ({r:.1f}x)")
        sys.exit(1)
    if missing or extra:
        print(f"\n{len(missing) + len(extra)} quer"
              f"{'y was' if len(missing) + len(extra) == 1 else 'ies were'} "
              "not measured at both scales (see MISSING above)")
        sys.exit(1)
    print("\nno super-linear queries: every ratio is at or below the "
          "data growth (within the fixed-cost floor)")


if __name__ == "__main__":
    main()
