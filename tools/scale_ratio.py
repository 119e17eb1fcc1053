#!/usr/bin/env python3
"""Empirical scaling-ratio table (r7 verdict item 1).

Usage: python3 tools/scale_ratio.py BENCH_small_full.json BENCH_big_full.json [factor]

Reads two full bench maps taken at different data scales (e.g. sf0.1
and sf1) and prints, per common query, t_big / t_small sorted worst
first — the table SURVEY §7 commits. `factor` (default 10) is the data
scale-up; ratios are judged against it:
  - ratio <= factor           : sub-linear / linear — scales
  - factor < ratio <= 1.5x    : fixed-overhead noise band on fast
                                queries, or mildly super-linear — watch
  - ratio >  1.5x factor      : super-linear — audit or fix
Queries under `floor` seconds in the SMALL map (default 0.15 s) are
summarized separately: their small-SF time is dominated by fixed
per-query overhead, so the ratio is not a scaling signal.
"""
import json
import sys


def load(path, prefer_isolated=False):
    with open(path) as f:
        doc = json.load(f)
    out = {}
    for k, v in doc.get("queries", doc).items():
        if isinstance(v, dict):
            # "isolated" (min-of-N on an idle box) is the cleaner scaling
            # signal when present - suite numbers can carry concurrent-load
            # drift (pass --isolated to use it)
            v = v.get("isolated") if prefer_isolated and "isolated" in v else v.get("suite")
        if isinstance(v, (int, float)) and v >= 0:
            out[k] = float(v)
    return out


def main():
    args = [a for a in sys.argv[1:] if a != "--isolated"]
    prefer_iso = "--isolated" in sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        sys.exit(2)
    small_p, big_p = args[0], args[1]
    factor = float(args[2]) if len(args) > 2 else 10.0
    floor = 0.15
    small, big = load(small_p, prefer_iso), load(big_p, prefer_iso)
    common = sorted(set(small) & set(big))
    scored = [(big[q] / max(small[q], 1e-9), q) for q in common if small[q] >= floor]
    tiny = [q for q in common if small[q] < floor]
    scored.sort(reverse=True)
    t_s = sum(small[q] for q in common)
    t_b = sum(big[q] for q in common)
    print(f"common: {len(common)} queries; totals {t_s:.1f} -> {t_b:.1f} s "
          f"(aggregate ratio {t_b / t_s:.1f}x on {factor:.0f}x data)")
    print(f"| query | t_small | t_big | ratio |")
    print(f"| --- | --- | --- | --- |")
    for r, q in scored:
        flag = " ⚠" if r > 1.5 * factor else ""
        print(f"| {q}{flag} | {small[q]:.2f} | {big[q]:.2f} | {r:.1f}x |")
    if tiny:
        worst = max((big[q], q) for q in tiny)
        print(f"\n{len(tiny)} queries under {floor}s at the small SF "
              f"(fixed-overhead band; worst big-SF time among them: "
              f"{worst[1]} at {worst[0]:.2f}s)")
    over = [q for r, q in scored if r > 1.5 * factor]
    print(f"\nsuper-linear (> {1.5 * factor:.0f}x): {len(over)}"
          + (": " + ", ".join(over) if over else ""))


if __name__ == "__main__":
    main()
