#!/usr/bin/env python3
"""Assemble the full-inventory 1x/10x scale table from two bench_full.json
dumps (min-of-two-passes per query). Usage:
    python3 tools/scale_table.py /tmp/scale_1x.json /tmp/scale_10x.json
Prints a markdown table sorted by ratio descending, flagging ratios > 3x.
"""
import json, sys

a = json.load(open(sys.argv[1]))["queries"]
b = json.load(open(sys.argv[2]))["queries"]

rows = []
for name in sorted(a):
    t1, t10 = a[name]["min"], b.get(name, {}).get("min", -1)
    ratio = (t10 / t1) if (t1 and t1 > 0 and t10 > 0) else float("nan")
    rows.append((name, t1, t10, ratio))

rows.sort(key=lambda r: -(r[3] if r[3] == r[3] else -1))
print("| query | 1x (s) | 10x (s) | ratio | flag |")
print("|---|---|---|---|---|")
for name, t1, t10, ratio in rows:
    flag = "**>3x**" if ratio == ratio and ratio > 3 else ""
    print(f"| {name} | {t1:.2f} | {t10:.2f} | {ratio:.1f}x | {flag} |")
flagged = [r for r in rows if r[3] == r[3] and r[3] > 3]
print(f"\n{len(rows)} queries; {len(flagged)} above 3x: {[r[0] for r in flagged]}")
