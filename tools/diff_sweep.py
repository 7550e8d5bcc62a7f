"""Diff a bench.py sweep against the committed SWEEP_BASELINE.json.

Usage: python tools/diff_sweep.py [bench_json] [--band 0.35]

Reads the one-line bench JSON (default: run `python bench.py` and pipe in a
file path), compares its `sweep` (and, when present on both sides,
`sweep_build`) blocks per-query against SWEEP_BASELINE.json, and reports
queries outside the noise band (relative, on max(time, 0.2s) so sub-100ms
queries don't trip on scheduler jitter). The two tiers are merged for the
comparison so a query MOVING between tiers (bench.py r7: the index/model
build tier split) is neither "missing" nor "new". Exit 1 if any regression
exceeds the band — the sweep-tier analogue of the headline comparison.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_SEC = 0.2  # below this, absolute jitter dominates — compare on the floor


def main() -> int:
    band = 0.35
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--band"):
            if "=" in a:
                band = float(a.split("=", 1)[1])
            else:
                i += 1
                band = float(argv[i])
        else:
            args.append(a)
        i += 1
    bench_path = args[0] if args else None
    if bench_path is None:
        print("usage: python tools/diff_sweep.py <bench_json> [--band 0.35]")
        return 2
    cur = json.load(open(bench_path))
    if not cur.get("sweep"):
        print("bench JSON has no `sweep` block (SPARK_GRAFT_SKIP_SWEEP set?)")
        return 2
    # merge the query tier and the build tier on both sides: tier
    # membership is a reporting split, not an identity change
    sweep = {**cur.get("sweep", {}), **cur.get("sweep_build", {})}
    base_doc = json.load(open(os.path.join(ROOT, "SWEEP_BASELINE.json")))
    base = {**base_doc.get("sweep", {}), **base_doc.get("sweep_build", {})}

    regressions, improvements, new = [], [], []
    for name, t in sweep.items():
        if name not in base:
            new.append(name)
            continue
        b = base[name]
        rel = (t - b) / max(b, FLOOR_SEC)
        if rel > band:
            regressions.append((rel, name, b, t))
        elif rel < -band:
            improvements.append((rel, name, b, t))
    for rel, name, b, t in sorted(regressions, reverse=True):
        print(f"REGRESSION  {name:30s} {b:6.2f}s -> {t:6.2f}s  ({rel:+.0%})")
    for rel, name, b, t in sorted(improvements):
        print(f"improved    {name:30s} {b:6.2f}s -> {t:6.2f}s  ({rel:+.0%})")
    for name in new:
        print(f"new         {name:30s} {sweep[name]:6.2f}s (no baseline)")
    gone = sorted(set(base) - set(sweep))
    for name in gone:
        print(f"MISSING     {name} (in baseline, not in sweep)")
    print(
        f"\n{len(sweep)} queries; {len(regressions)} regressions > {band:.0%}, "
        f"{len(improvements)} improvements, {len(new)} new, {len(gone)} missing "
        f"(sweep total {sum(sweep.values()):.1f}s vs baseline {sum(base.values()):.1f}s)"
    )
    return 1 if regressions or gone else 0


if __name__ == "__main__":
    sys.exit(main())
