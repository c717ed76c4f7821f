#!/usr/bin/env python
"""Summarize a min-of-N bench series: per-query min across runs, headline
and rotation totals, codegen-gate status, and a regression comparison
against a prior series (same protocol).

Usage: python tools/bench_series_report.py artifacts/BENCH_r10_local*.json \
           [--prev artifacts/BENCH_r09_local*.json-glob] [--oracle FILE]
"""

from __future__ import annotations

import argparse
import glob
import json


def load_series(paths: list[str]) -> tuple[dict, dict, list]:
    heads: dict[str, list[float]] = {}
    rots: dict[str, list[float]] = {}
    gates = []
    for p in paths:
        with open(p) as fh:
            d = json.load(fh)
        for k, v in d.get("queries", {}).items():
            heads.setdefault(k, []).append(v)
        for k, v in d.get("rotation", {}).items():
            rots.setdefault(k, []).append(v)
        if "codegen_fallbacks" in d:
            gates.append((p, d["codegen_fallbacks"], d.get("codegen_gate")))
    return (
        {k: min(v) for k, v in heads.items()},
        {k: min(v) for k, v in rots.items()},
        gates,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--prev", default="")
    ap.add_argument("--oracle", default="")
    args = ap.parse_args()
    heads, rots, gates = load_series(args.files)
    print(f"runs={len(args.files)} headline_n={len(heads)} rotation_n={len(rots)}")
    print(f"headline_min_total={sum(heads.values()):.1f}s "
          f"rotation_min_total={sum(rots.values()):.1f}s")
    for p, fb, verdict in gates:
        if fb or verdict != "pass":
            print(f"codegen {p}: {fb} -> {verdict}")
    slowest = sorted(heads.items(), key=lambda t: -t[1])[:8]
    print("slowest headline:", [(k, round(v, 2)) for k, v in slowest])
    if args.prev:
        ph, pr, _ = load_series(sorted(glob.glob(args.prev)))
        shared = sorted(set(heads) & set(ph))
        tot_now = sum(heads[k] for k in shared)
        tot_prev = sum(ph[k] for k in shared)
        print(f"shared-{len(shared)} vs prev: {tot_prev:.1f}s -> {tot_now:.1f}s")
        regs = [
            (k, ph[k], heads[k])
            for k in shared
            if heads[k] > ph[k] * 1.25 and heads[k] - ph[k] > 0.3
        ]
        print("regressions(>1.25x & >0.3s):",
              [(k, round(a, 2), round(b, 2)) for k, a, b in regs])
    if args.oracle:
        with open(args.oracle) as fh:
            od = json.load(fh)
        oq = od.get("queries", {})
        shared = sorted(set(heads) & set(oq))
        s_tot = sum(heads[k] for k in shared)
        o_tot = sum(oq[k] for k in shared)
        if shared and o_tot:
            print(f"vs DuckDB oracle on {len(shared)} shared: spark {s_tot:.1f}s "
                  f"duck {o_tot:.1f}s ratio {s_tot / o_tot:.2f}")
        else:
            # wrong file / renamed queries: say so instead of dying on /0
            print(f"vs DuckDB oracle: no shared queries with {args.oracle} "
                  f"({len(oq)} oracle entries, {len(heads)} series entries)")


if __name__ == "__main__":
    main()
