#!/usr/bin/env python
"""UltraFace demo — tm_ultraface equivalent (tests/models/test_model_ultraface.cpp).

Slim depthwise-separable SSD face detector: 4 scales of cls/reg heads,
prior-box decode + NMS on the host (native C++ NMS).

    python examples/tm_ultraface.py [-q uint8] [-i img.jpg]
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
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("-t", "--threshold", type=float, default=0.7)
    args = ap.parse_args()

    import torch

    import tengine_tpu as tt
    from tengine_tpu import native
    from tengine_tpu.models.detect_zoo import (
        build_ultraface_graph,
        decode_ultraface,
        flatten_ultraface,
        ultraface_priors,
    )
    from tengine_tpu.utils.config import Options

    torch.manual_seed(0)
    _, g = build_ultraface_graph(img_h=args.height, img_w=args.width)

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.width, args.height))
        ).astype(np.float32)
        x = ((img - 127.0) / 128.0).transpose(2, 0, 1)[None]
    else:
        x = np.random.default_rng(0).standard_normal(
            (1, 3, args.height, args.width)
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

    scores, boxes = flatten_ultraface(outs)
    priors = ultraface_priors(args.height, args.width)
    dets = decode_ultraface(scores, boxes, priors, score_threshold=args.threshold)
    if len(dets):
        px = dets[:, :4] * [args.width, args.height, args.width, args.height]
        keep = native.nms(px, dets[:, 4], iou_threshold=0.5)
        dets = np.concatenate([px[keep], dets[keep, 4:5]], axis=1)
    print(f"inference {dt * 1e3:.2f} ms ({args.quant}); {len(dets)} faces")
    for x0, y0, x1, y1, s in dets[:20]:
        print(f"  score {s:.3f}  box ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")


if __name__ == "__main__":
    main()
