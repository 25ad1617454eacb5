#!/usr/bin/env python3
"""Serving-knee-vs-grid table from committed bench jsonl artifacts.

Round-4 verdict #6: complete the serving-knee curve between the measured
256^2 (~17.5k aggregate steps/s) and 1024^2 (~1.1k) endpoints and name the
largest grid at which ONE chip of this class serves >10,000 aggregate
steps/s (the reference's own bar is one sim at 60 steps/s, period —
script.js:982-1010,1191).

Reads every ``--config 7`` (batched serving) row from the given jsonl
files, groups by (grid, B), prints a markdown table plus a JSON summary
line, and derives the >10k crossover grid by pixel-rate interpolation
between the bracketing saturated grids.

Grids whose side has no aligned row divisor (e.g. 304 = 16*19) used to
fall off a 5x-halo-overcompute cliff (~45% of neighbors' texel rate);
dispatch._padded_shape now pad-repairs such heights (304 -> 320, device
A/B 4,640 -> 8,608 aggregate — docs/BENCH.md round 14). Non-multiple-of-32
rows are labeled "(pad-repaired)" and still excluded from the crossover
derivation when their texel rate sits below the saturated envelope
(texel rate >= the over-grid's).

Usage: python tools/knee_table.py out/bench_r15.jsonl out/bench_r16.jsonl \
           out/bench_r17.jsonl out/bench_r18.jsonl
"""
import json
import re
import sys


def load_rows(paths):
    rows = {}
    for p in paths:
        for ln in open(p):
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if d.get("summary"):
                continue
            m = re.match(r"aggregate sim steps/sec, (\d+) batched (\d+)\^2 ",
                         d.get("metric", ""))
            if not m:
                continue
            b, r = int(m.group(1)), int(m.group(2))
            if "per-sim dt" in d["metric"]:
                continue  # lock-step protocol only, like the r15 sweep
            # Last measurement wins (later files = newer HEAD).
            rows[(r, b)] = d["value"]
    return rows


def main():
    paths = sys.argv[1:] or ["out/bench_r15.jsonl", "out/bench_r16.jsonl",
                             "out/bench_r17.jsonl", "out/bench_r18.jsonl"]
    rows = load_rows(paths)
    grids = sorted({r for r, _ in rows})
    bs = sorted({b for _, b in rows})
    print("| grid | " + " | ".join(f"B={b}" for b in bs) + " | texel rate |")
    print("|---" * (len(bs) + 2) + "|")
    best = {}
    for r in grids:
        cells = []
        for b in bs:
            v = rows.get((r, b))
            cells.append(f"{v:,.0f}" if v is not None else "")
            if v is not None:
                best[r] = max(best.get(r, 0.0), v)
        cliff = " (pad-repaired)" if r % 32 else ""
        print(f"| {r}^2{cliff} | " + " | ".join(cells)
              + f" | {best[r] * r * r / 1e9:.2f} Gtexel/s |")

    # Largest measured grid whose saturated aggregate clears 10k. The
    # crossover bracket uses saturated-envelope grids only: an under-grid
    # qualifies if its texel rate (aggregate*pixels) is >= the over-grid's
    # — tile-unfriendly cliff rows fall below the envelope and are skipped.
    over = [r for r in grids if best[r] > 10_000.0]
    summary = {"knee_table": {f"{r}^2": round(best[r], 1) for r in grids}}
    if over:
        lo = max(over)
        summary["largest_grid_over_10k"] = f"{lo}^2"
        summary["largest_grid_over_10k_aggregate"] = round(best[lo], 1)
        rate_lo = best[lo] * lo * lo
        hi = min([r for r in grids if r > lo and best[r] <= 10_000.0
                  and best[r] * r * r >= rate_lo], default=None)
        if hi is not None:
            summary["first_grid_under_10k"] = f"{hi}^2"
            # Interpolate the texel rate linearly in side, solve rate/s^2=10k.
            k_lo, k_hi = rate_lo, best[hi] * hi * hi
            s = lo
            for _ in range(40):
                k = k_lo + (k_hi - k_lo) * (s - lo) / (hi - lo)
                s = (k / 1e4) ** 0.5
            summary["crossover_side_interpolated"] = round(s)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
