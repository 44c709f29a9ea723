#!/usr/bin/env python3
"""Per-query scaling table from two Bench JSON lines (e.g. sf0.1 vs sf1.0).

Usage: scaling_report.py <bench_small.log> <bench_big.log> <data_ratio>

Extracts the one-line {"metric":"total",...} JSON from each log, prints a
markdown table of per-query seconds and the big/small runtime ratio, sorted
by ratio descending. With a data ratio of N, a perfectly linear operator
shows ratio <= N (usually far less while per-query fixed costs dominate);
ratios well above N flag super-linear plans worth a look.
"""
import json
import re
import sys


def bench_line(path):
    with open(path) as f:
        for line in f:
            m = re.search(r'\{"metric":"total".*\}', line)
            if m:
                return json.loads(m.group(0))
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    small, big = bench_line(sys.argv[1]), bench_line(sys.argv[2])
    ratio_target = float(sys.argv[3])
    rows = []
    for q, t_small in small["queries"].items():
        t_big = big["queries"].get(q)
        if t_big is None or t_small <= 0 or t_big < 0:
            continue
        rows.append((q, t_small, t_big, t_big / t_small))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | sf0.1 s | sf1.0 s | ratio (data x{ratio_target:g}) |")
    print("|---|---|---|---|")
    for q, a, b, r in rows:
        flag = " **super-linear**" if r > ratio_target else ""
        print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    print(f"\ntotal: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value'] / small['value']:.1f}x on {ratio_target:g}x data)")


if __name__ == "__main__":
    main()
