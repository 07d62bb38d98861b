#!/usr/bin/env python
"""MoveNet single-person pose demo — tm_movenet equivalent
(examples/tm_movenet.cpp).

Depthwise-separable backbone + stride-4 neck, four heads
(center/heatmaps/regression/offsets), center-based keypoint decode.

    python examples/tm_movenet.py [-q int8] [-s 192] [-i img.jpg]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COCO_JOINTS = [
    "nose", "l_eye", "r_eye", "l_ear", "r_ear", "l_shoulder", "r_shoulder",
    "l_elbow", "r_elbow", "l_wrist", "r_wrist", "l_hip", "r_hip",
    "l_knee", "r_knee", "l_ankle", "r_ankle",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--image", default=None)
    ap.add_argument("-q", "--quant", choices=["fp32", "int8", "uint8"], default="fp32")
    ap.add_argument("-s", "--size", type=int, default=192)
    args = ap.parse_args()

    import torch

    import tengine_tpu as tt
    from tengine_tpu.models.detect_zoo2 import build_movenet_graph, decode_movenet
    from tengine_tpu.utils.config import Options

    torch.manual_seed(0)
    _, g = build_movenet_graph(img=args.size)

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.size, args.size))
        ).astype(np.float32)
        x = (img / 127.5 - 1.0).transpose(2, 0, 1)[None]
    else:
        x = np.random.default_rng(0).standard_normal(
            (1, 3, args.size, args.size)
        ).astype(np.float32)

    if args.quant != "fp32":
        from tengine_tpu.ops import qmath
        from tengine_tpu.quantize.quantizer import quantize_graph

        qg = quantize_graph(g, [x], scheme=args.quant, algorithm="minmax")
        cg = tt.compile_graph(qg, Options(quant_mode="fast"))
        t_in = qg.tensors[qg.input_tensors[0]]
        out_ids = [qg.nodes[i].outputs[0] for i in qg.outputs]
        xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
        t0 = time.time()
        outs = cg.run(xq)
        dt = time.time() - t0
        outs = [
            qmath.dequantize_np(np.asarray(o, np.float32), qg.tensors[t].quant)
            for o, t in zip(outs, out_ids)
        ]
    else:
        cg = tt.compile_graph(g, Options(precision="fp32"))
        t0 = time.time()
        outs = cg.run(x)
        dt = time.time() - t0

    kps, scores = decode_movenet(*[np.asarray(o) for o in outs], img=args.size)
    print(f"inference {dt * 1e3:.2f} ms ({args.quant})")
    for name, (px, py), s in zip(COCO_JOINTS, kps, scores):
        print(f"  {name:11s} ({px:6.1f},{py:6.1f})  score {s:.3f}")


if __name__ == "__main__":
    main()
