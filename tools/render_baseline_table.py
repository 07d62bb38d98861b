#!/usr/bin/env python
"""Render baseline_table.json (tools/fill_baseline.py output) as the
BASELINE.md same-host markdown table."""

import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "baseline_table.json")) as f:
    data = json.load(f)

# reference single-thread fp32 minimums measured on this host (BASELINE.md)
REF_MS = {
    "squeezenet_v1.1": 24.34, "mobilenetv1": 26.62, "mobilenetv2": 26.97,
    "mobilenetv3": 25.73, "shufflenetv2": 8.93, "resnet18": 62.22,
    "resnet50": 151.20, "googlenet": 84.84, "inceptionv3": 258.50,
    "vgg16": 506.42, "mssd": 60.50, "retinaface": 11.14,
    "yolov3_tiny": 122.17, "mobilefacenets": 13.00,
}


def cell(model, scheme, batch, field):
    r = data.get(f"{model}|{scheme}|b{batch}")
    if not r or "error" in r:
        return None
    return r[field]


print("| model | ref fp32 1t (ms) | fp32 b1 p50 (ms) | speedup | "
      "uint8 b1 p50 (ms) | uint8 b128 (img/s) | int8-KL b128 (img/s) |")
print("|---|---|---|---|---|---|---|")
for m, ref in REF_MS.items():
    f1 = cell(m, "fp32_fast", 1, "ms")
    u1 = cell(m, "uint8", 1, "ms")
    u128 = cell(m, "uint8", 128, "img_s")
    i128 = cell(m, "int8", 128, "img_s")

    def fmt(v, nd=3):
        return f"{v:.{nd}f}" if v is not None else "—"

    sp = f"{ref / f1:.0f}x" if f1 else "—"
    print(f"| {m} | {ref:.2f} | {fmt(f1)} | {sp} | {fmt(u1)} | "
          f"{fmt(u128, 0) if u128 else '—'} | {fmt(i128, 0) if i128 else '—'} |")
