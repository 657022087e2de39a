#!/usr/bin/env python3
"""Render the BENCH_SCALING.md three-point table from the committed quiet
run JSONs (BENCH_SCALING_sf001/sf01/sf1.json). r1 = sf0.1/sf0.01,
r2 = sf1/sf0.1 (each for 10x data); curv = r2/r1. Flag rule (per the
round-6 verdict): curvature > 1.5 is worth a look, but the decisive
signal is r2 > 10 — a second-decade ratio beyond linear once fixed costs
have amortized. Queries without an sf1 point show only r1."""
import json
import sys


def main():
    a = json.load(open("BENCH_SCALING_sf001.json"))
    b = json.load(open("BENCH_SCALING_sf01.json"))
    c = json.load(open("BENCH_SCALING_sf1.json"))
    qa, qb, qc = a["queries"], b["queries"], c["queries"]
    rows = []
    for q in qb:
        store = q.startswith("store_")
        r1 = qb[q] / qa[q] if qa.get(q) else None
        if q in qc and r1:
            r2 = qc[q] / qb[q]
            rows.append((q, qa[q], qb[q], qc[q], r1, r2, r2 / r1, store))
        elif r1:
            rows.append((q, qa[q], qb[q], None, r1, None, None, store))
    rows.sort(key=lambda r: (-(r[5] or -1), -(r[4] or -1)))
    print("| query | sf0.01 s | sf0.1 s | sf1 s | r1 | r2 | curv | flag |")
    print("|---|---|---|---|---|---|---|---|")
    for q, t1, t2, t3, r1, r2, cv, store in rows:
        t3s = f"{t3:.3f}" if t3 is not None else "—"
        r2s = f"{r2:.2f}" if r2 is not None else "—"
        cvs = f"{cv:.2f}" if cv is not None else "—"
        flag = ""
        if store:
            flag = "store (fixed size)"
        elif r2 is not None and r2 > 10:
            flag = "**r2>10**"
        elif cv is not None and cv > 1.5:
            flag = "curv>1.5"
        print(f"| {q} | {t1:.3f} | {t2:.3f} | {t3s} | {r1:.2f} | {r2s} | {cvs} | {flag} |")
    tot_b = sum(qb[q] for q in qb if q in qa)
    tot_a = sum(qa[q] for q in qb if q in qa)
    tot_c = sum(qc[q] for q in qc if q in qb)
    tot_b_sub = sum(qb[q] for q in qc if q in qb)
    print(
        f"\nTotals: sf0.01→sf0.1 full set {tot_a:.1f}s → {tot_b:.1f}s "
        f"(ratio {tot_b / tot_a:.2f}); sf0.1→sf1 subset "
        f"{tot_b_sub:.1f}s → {tot_c:.1f}s (ratio {tot_c / tot_b_sub:.2f})."
    )


if __name__ == "__main__":
    sys.exit(main())
