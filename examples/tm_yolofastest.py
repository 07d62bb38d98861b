#!/usr/bin/env python
"""YOLO-Fastest demo — tm_yolofastest equivalent
(/root/reference/examples/tm_yolofastest.cpp): darknet cfg import with
load-time BN fold, region-head decode + native NMS.

    python examples/tm_yolofastest.py [-q uint8] [-i img.jpg]
"""
import sys, os
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _runner import std_parser, load_input, run_graph


def main():
    args = std_parser(size=320).parse_args()
    from tengine_tpu import native
    from tengine_tpu.models.darknet_zoo import (
        build_yolofastest_graph, decode_darknet_yolo,
    )

    g = build_yolofastest_graph(img=args.size)
    yolo_params = [n.params for n in g.nodes
                   if n.op == "Dropout" and "classes" in n.params]
    x = load_input(args, mean=(0.0, 0.0, 0.0),
                   scale=(1 / 255.0, 1 / 255.0, 1 / 255.0))
    outs, ms = run_graph(g, x, args.quant, args.repeat)
    dets = decode_darknet_yolo(outs, yolo_params, args.size, 0.25)
    if len(dets):
        keep = native.nms(dets[:, :4], dets[:, 4], iou_threshold=0.45)
        dets = dets[keep]
    print(f"inference {ms:.2f} ms ({args.quant}); {len(dets)} detections")
    for x0, y0, x1, y1, s, c in dets[:15]:
        print(f"  cls {int(c):3d}  score {s:.3f}  "
              f"box ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")


if __name__ == "__main__":
    main()
