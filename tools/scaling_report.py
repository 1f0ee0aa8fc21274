#!/usr/bin/env python3
"""Build the scaling artifact from two single-pass Bench runs.

Usage: scaling_report.py <base_bench.json> <scaled_bench.json> <factor> <out.json>

Reads the two BENCH_full-format artifacts (same host, same pass count),
computes per-query time(scaled)/time(base) ratios, and writes one JSON
with the full table plus a verdict per query:

  - "linear"      ratio <= factor (work grew at most proportionally)
  - "sublinear"   ratio <= 2 (fixed overheads dominate at this size)
  - "watch"       factor < ratio <= 1.2*factor (within noise of linear)
  - "superlinear" ratio > 1.2*factor (needs an explanation or a fix)

The 1.2 slack absorbs single-pass timing noise; anything flagged
superlinear must be explained in the committed artifact's notes or
fixed before the round closes.
"""
import json
import sys


def main() -> None:
    base_path, scaled_path, factor_s, out_path = sys.argv[1:5]
    factor = float(factor_s)
    base = json.load(open(base_path))
    scaled = json.load(open(scaled_path))
    rows = {}
    for q, t1 in sorted(base["queries"].items()):
        t10 = scaled["queries"].get(q)
        if t10 is None:
            rows[q] = {"base_sec": round(t1, 3), "scaled_sec": None,
                       "ratio": None, "verdict": "missing"}
            continue
        ratio = t10 / t1 if t1 > 0 else float("inf")
        if ratio <= 2.0:
            v = "sublinear"
        elif ratio <= factor:
            v = "linear"
        elif ratio <= 1.2 * factor:
            v = "watch"
        else:
            v = "superlinear"
        rows[q] = {"base_sec": round(t1, 3), "scaled_sec": round(t10, 3),
                   "ratio": round(ratio, 2), "verdict": v}
    counts = {}
    for r in rows.values():
        counts[r["verdict"]] = counts.get(r["verdict"], 0) + 1
    out = {
        "factor": factor,
        "base": {"sf": base["sf"], "passes": base.get("passes"),
                 "calib": base.get("calib"), "total_sec": round(base["value"], 1),
                 "n_queries": base["n_queries"]},
        "scaled": {"sf": scaled["sf"], "passes": scaled.get("passes"),
                   "calib": scaled.get("calib"),
                   "total_sec": round(scaled["value"], 1),
                   "n_queries": scaled["n_queries"]},
        "verdict_counts": counts,
        "superlinear": sorted(
            [q for q, r in rows.items() if r["verdict"] == "superlinear"],
            key=lambda q: -rows[q]["ratio"]),
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{out_path}: {counts}")
    for q in out["superlinear"]:
        r = rows[q]
        print(f"  SUPERLINEAR {q}: {r['base_sec']}s -> {r['scaled_sec']}s "
              f"(x{r['ratio']})")


if __name__ == "__main__":
    main()
