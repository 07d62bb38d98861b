#!/usr/bin/env python
"""PicoDet demo — tm_picodet equivalent
(/root/reference/examples/tm_picodet.cpp): ESNet backbone (SE shuffle
blocks), CSP-PAN neck, per-level cls/dis heads at strides 8/16/32/64,
softmax-DFL decode + native NMS.

    python examples/tm_picodet.py [-q uint8] [-i img.jpg]
"""
import sys, os
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _runner import std_parser, load_input, run_graph


def main():
    args = std_parser(size=320).parse_args()
    import torch
    from tengine_tpu import native
    from tengine_tpu.models.detect_zoo3 import build_picodet_graph, decode_picodet

    torch.manual_seed(0)
    _, g = build_picodet_graph(img=args.size)
    x = load_input(args, mean=(103.53, 116.28, 123.675),
                   scale=(1 / 57.375, 1 / 57.12, 1 / 58.395))
    outs, ms = run_graph(g, x, args.quant, args.repeat)
    dets = decode_picodet(outs, args.size, score_threshold=0.35)
    if len(dets):
        keep = native.nms(dets[:, :4], dets[:, 4], iou_threshold=0.5)
        dets = dets[keep]
    print(f"inference {ms:.2f} ms ({args.quant}); {len(dets)} detections")
    for x0, y0, x1, y1, s, c in dets[:15]:
        print(f"  cls {int(c):3d}  score {s:.3f}  "
              f"box ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")


if __name__ == "__main__":
    main()
