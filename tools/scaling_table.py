#!/usr/bin/env python3
"""Render the BENCH_SCALING.md scaling table from the committed quiet
run JSONs (BENCH_SCALING_sf001/sf01/sf1.json, plus the optional
fourth-decade BENCH_SCALING_sf10.json for the heavy family).
r1 = sf0.1/sf0.01, r2 = sf1/sf0.1, r3 = sf10/sf1 (each for 10x data);
curv = r2/r1. Flag rule (per the round-6 verdict): curvature > 1.5 is
worth a look, but the decisive signal is r2 > 10 (or r3 > 10 where
measured) — a deep-decade ratio beyond linear once fixed costs have
amortized. Missing points render as dashes (never silently dropped:
a query benched at only one SF is a COVERAGE GAP the table must show).
The sf10 column is a SUBSET by design (the ~15 most expensive queries);
its dashes are not coverage gaps."""
import json
import os
import sys


def tof(v):
    """A usable timing: present and strictly positive (a 0.0 entry is a
    failed/placeholder measurement, not a valid denominator)."""
    return v if v is not None and v > 0 else None


def main():
    a = json.load(open("BENCH_SCALING_sf001.json"))
    b = json.load(open("BENCH_SCALING_sf01.json"))
    c = json.load(open("BENCH_SCALING_sf1.json"))
    qd = {}
    if os.path.exists("BENCH_SCALING_sf10.json"):
        qd = json.load(open("BENCH_SCALING_sf10.json"))["queries"]
    qa, qb, qc = a["queries"], b["queries"], c["queries"]
    names = list(qb) + [q for q in qa if q not in qb] + [
        q for q in qc if q not in qa and q not in qb
    ]
    rows = []
    for q in names:
        t1, t2, t3, t4 = tof(qa.get(q)), tof(qb.get(q)), tof(qc.get(q)), tof(qd.get(q))
        r1 = t2 / t1 if t1 is not None and t2 is not None else None
        r2 = t3 / t2 if t2 is not None and t3 is not None else None
        r3 = t4 / t3 if t3 is not None and t4 is not None else None
        cv = r2 / r1 if r1 is not None and r2 is not None else None
        rows.append((q, t1, t2, t3, t4, r1, r2, r3, cv, q.startswith("store_")))
    rows.sort(key=lambda r: (-(r[7] or -1), -(r[6] or -1), -(r[5] or -1)))
    print("| query | sf0.01 s | sf0.1 s | sf1 s | sf10 s | r1 | r2 | r3 | curv | flag |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for q, t1, t2, t3, t4, r1, r2, r3, cv, store in rows:
        def fmt(v, spec=".3f"):
            return f"{v:{spec}}" if v is not None else "—"
        flag = ""
        if store:
            flag = "store (see store scaling rows)"
        elif r3 is not None and r3 > 10:
            flag = "**r3>10**"
        elif r2 is not None and r2 > 10:
            flag = "**r2>10**"
        elif cv is not None and cv > 1.5:
            flag = "curv>1.5"
        elif r1 is None and r2 is None:
            flag = "no ratio (coverage gap)"
        print(
            f"| {q} | {fmt(t1)} | {fmt(t2)} | {fmt(t3)} | {fmt(t4)} "
            f"| {fmt(r1, '.2f')} | {fmt(r2, '.2f')} | {fmt(r3, '.2f')} "
            f"| {fmt(cv, '.2f')} | {flag} |")
    both_ab = [q for q in qb if tof(qa.get(q)) and tof(qb.get(q))]
    both_bc = [q for q in qc if tof(qb.get(q)) and tof(qc.get(q))]
    tot_a = sum(qa[q] for q in both_ab)
    tot_b = sum(qb[q] for q in both_ab)
    tot_b_sub = sum(qb[q] for q in both_bc)
    tot_c = sum(qc[q] for q in both_bc)
    print(
        f"\nTotals: sf0.01→sf0.1 shared set ({len(both_ab)} metrics) "
        f"{tot_a:.1f}s → {tot_b:.1f}s (ratio {tot_b / tot_a:.2f}); "
        f"sf0.1→sf1 subset ({len(both_bc)} metrics) "
        f"{tot_b_sub:.1f}s → {tot_c:.1f}s (ratio {tot_c / tot_b_sub:.2f})."
    )
    both_cd = [q for q in qd if tof(qc.get(q)) and tof(qd.get(q))]
    if both_cd:
        tot_c_sub = sum(qc[q] for q in both_cd)
        tot_d = sum(qd[q] for q in both_cd)
        print(
            f"sf1→sf10 heavy-family subset ({len(both_cd)} metrics) "
            f"{tot_c_sub:.1f}s → {tot_d:.1f}s (ratio {tot_d / tot_c_sub:.2f})."
        )
    # Store tier: fixtures are generated (not SF-scaled), so its scaling
    # axis is the 100k -> 1M twin pair inside ONE quiet run (sf0.1 leg).
    pairs = [
        ("store_produce_100k", "store_produce_1m"),
        ("store_consume_segment", "store_consume_segment_1m"),
        ("store_consume_space", "store_consume_space_1m"),
        ("store_compact_100k", "store_compact_1m"),
    ]
    # NOTE: the store tier's scaling table is the HAND-MAINTAINED
    # three-decade (100k → 1M → 10M) section in BENCH_SCALING.md — this
    # tool no longer prints its superseded two-decade form (each
    # regeneration used to re-print it next to the re-appended hand
    # section, triplicating the table). Regeneration convention: replace
    # from the `| query |` header through the Totals lines with this
    # tool's output, keep everything after "### Store tier" as is.
    if any(tof(qb.get(s)) and tof(qb.get(l)) for s, l in pairs):
        print(
            "\n(store tier: see the hand-maintained "
            "'Store tier (100k → 1M → 10M rows)' section below — "
            "two-decade columns come from the sf0.1 leg pairs "
            + ", ".join(f"{s}/{l}" for s, l in pairs)
            + ")"
        )


if __name__ == "__main__":
    sys.exit(main())
