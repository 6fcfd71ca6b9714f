#!/usr/bin/env python3
"""Per-query growth report between two bench JSON lines (e.g. sf0.1 vs the
ScaleUp'd sf1): ratio table sorted worst-first, flagging anything past the
data-scale factor (default 10x). Usage:

    python3 tools/scale_report.py small.json big.json [scale]

Queries in error state in either file are listed separately. Sub-second
small-side timings are floored (noise floor) so a 0.08s -> 0.9s read does
not report as 11x: ratios use max(t, floor) on both sides, floor=0.5s.
"""
import json, sys

FLOOR = 0.5


def load(path):
    d = json.load(open(path))
    qs, errs = {}, {}
    for k, v in d["queries"].items():
        if isinstance(v, dict):
            errs[k] = v.get("err", "?")
        else:
            qs[k] = float(v)
    return qs, errs


def main(small, big, scale=10.0):
    qa, ea = load(small)
    qb, eb = load(big)
    rows = []
    for q in sorted(set(qa) & set(qb)):
        ra, rb = max(qa[q], FLOOR), max(qb[q], FLOOR)
        rows.append((rb / ra, q, qa[q], qb[q]))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > scale]
    print(f"| query | t_small (s) | t_big (s) | growth |")
    print(f"| --- | --- | --- | --- |")
    for g, q, a, b in rows:
        flag = " **> scale**" if g > scale else ""
        print(f"| {q} | {a:.2f} | {b:.2f} | {g:.1f}x{flag} |")
    print()
    ta = sum(qa.values())
    tb = sum(qb.values())
    print(f"totals: {ta:.0f}s -> {tb:.0f}s ({tb/ta:.1f}x at {scale:.0f}x data); "
          f"{len(over)} queries beyond {scale:.0f}x; errors: small={sorted(ea)} big={sorted(eb)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
