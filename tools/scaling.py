#!/usr/bin/env python3
"""Scale-rehearsal analysis: per-query scaling exponents between two Bench
JSON outputs at different scale factors.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> <volume_ratio>
       (each file may hold 1+ JSON lines; per-query MEDIANS across lines are
        compared, matching the bench variance protocol)

exponent = log(t_big / t_small) / log(volume_ratio)
  ~1.0  linear (scan/join/agg should sit here or below)
  <1.0  sublinear (fixed overhead amortizing out — expected for cheap queries)
  >1.0  super-linear — a candidate-pair explosion, an unpruned scan, or a
        fixed-size assumption breaking; each needs a documented reason.

Queries under MIN_SEC at the small scale are overhead-dominated (JVM/job
scheduling noise ~100 ms swamps the signal); they are listed but not graded.
"""
import sys, json, math
from statistics import median

MIN_SEC = 0.5


def load(path):
    runs = []
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            runs.append(json.loads(line)["queries"])
    merged = {}
    for q in runs[0]:
        merged[q] = median(r[q] for r in runs if q in r)
    return merged


def main(small_path, big_path, ratio):
    small, big = load(small_path), load(big_path)
    rows = []
    for q in sorted(small):
        if q not in big:
            continue
        exp = math.log(big[q] / small[q]) / math.log(ratio)
        rows.append((q, small[q], big[q], exp, small[q] >= MIN_SEC))
    print(f"{'query':34} {'small(s)':>9} {'big(s)':>9} {'exponent':>9}  graded")
    for q, s, b, e, graded in rows:
        print(f"{q:34} {s:9.2f} {b:9.2f} {e:9.2f}  {'yes' if graded else 'no (overhead-dominated)'}")
    graded = [(q, e) for q, s, b, e, g in rows if g]
    bad = [(q, e) for q, e in graded if e > 1.15]
    print(f"\n== {len(rows)} queries, {len(graded)} graded, "
          f"{len(bad)} super-linear (exponent > 1.15)")
    for q, e in bad:
        print(f"   SUPER-LINEAR {q}: {e:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], float(sys.argv[3])))
