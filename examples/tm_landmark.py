#!/usr/bin/env python
"""Face landmark demo — tm_landmark / tm_landmark_uint8 / tm_landmark_timvx
equivalent (/root/reference/examples/tm_landmark.cpp): 106-point regression
head on a mobile backbone.

    python examples/tm_landmark.py [-q uint8] [-i face.jpg]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _runner import std_parser, load_input, run_graph


def main():
    args = std_parser(size=160).parse_args()
    import torch
    from tengine_tpu.models.detect_zoo import build_landmark_graph

    torch.manual_seed(0)
    _, g = build_landmark_graph(img=args.size)
    x = load_input(args, mean=(128.0, 128.0, 128.0),
                   scale=(1 / 128.0, 1 / 128.0, 1 / 128.0))
    outs, ms = run_graph(g, x, args.quant, args.repeat)
    pts = outs[0].reshape(-1, 2) * args.size
    print(f"inference {ms:.2f} ms ({args.quant}); {len(pts)} landmark points")
    for i in range(0, min(len(pts), 10)):
        print(f"  p{i:3d}  ({pts[i,0]:.1f},{pts[i,1]:.1f})")


if __name__ == "__main__":
    main()
