#!/usr/bin/env python
"""YOLOX demo — tm_yolox equivalent (examples/tm_yolox.cpp).

Anchor-free detection with a decoupled head: CSP backbone + PAFPN (SiLU),
grid decode of [reg4|obj1|clsC] maps at strides 8/16/32, native C++ NMS.

    python examples/tm_yolox.py [-q int8] [-s 416] [-i img.jpg]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--image", default=None)
    ap.add_argument("-q", "--quant", choices=["fp32", "int8", "uint8"], default="fp32")
    ap.add_argument("-s", "--size", type=int, default=416)
    ap.add_argument("-t", "--threshold", type=float, default=0.3)
    args = ap.parse_args()

    import torch

    import tengine_tpu as tt
    from tengine_tpu import native
    from tengine_tpu.models.detect_zoo2 import build_yolox_graph, decode_yolox
    from tengine_tpu.utils.config import Options

    torch.manual_seed(0)
    _, g = build_yolox_graph(img=args.size)

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.size, args.size))
        ).astype(np.float32)
        x = img.transpose(2, 0, 1)[None]  # yolox takes raw 0-255 input
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

    dets = decode_yolox([np.asarray(o) for o in outs], score_threshold=args.threshold)
    if len(dets):
        keep = native.nms(dets[:, :4], dets[:, 4], iou_threshold=0.45)
        dets = dets[keep]
    print(f"inference {dt * 1e3:.2f} ms ({args.quant}); {len(dets)} detections")
    for x0, y0, x1, y1, s, c in dets[:20]:
        print(f"  cls {int(c):3d}  score {s:.3f}  box ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")


if __name__ == "__main__":
    main()
