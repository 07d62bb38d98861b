#!/usr/bin/env python
"""SegFormer semantic-segmentation demo — tm_segformer equivalent
(examples/tm_segformer.cpp).

Mix-Transformer encoder (efficient self-attention with spatial reduction,
MixFFN) + all-MLP decode head; prints the stride-4 class map histogram.

    python examples/tm_segformer.py [-q int8] [-s 256] [-i img.jpg]
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
    ap.add_argument("-s", "--size", type=int, default=256)
    ap.add_argument("-c", "--classes", type=int, default=19)
    args = ap.parse_args()

    import torch

    import tengine_tpu as tt
    from tengine_tpu.models.transformer_zoo import (
        build_segformer_graph,
        segformer_classmap,
    )
    from tengine_tpu.utils.config import Options

    torch.manual_seed(0)
    _, g = build_segformer_graph(num_classes=args.classes, img=args.size)

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.size, args.size))
        ).astype(np.float32)
        mean = np.array([123.675, 116.28, 103.53], np.float32)
        std = np.array([58.395, 57.12, 57.375], np.float32)
        x = ((img - mean) / std).transpose(2, 0, 1)[None]
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
        out_id = qg.nodes[qg.outputs[0]].outputs[0]
        xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
        t0 = time.time()
        out = cg.run(xq)[0]
        dt = time.time() - t0
        out = qmath.dequantize_np(np.asarray(out, np.float32), qg.tensors[out_id].quant)
    else:
        cg = tt.compile_graph(g, Options(precision="fp32"))
        t0 = time.time()
        out = cg.run(x)[0]
        dt = time.time() - t0

    cmap = segformer_classmap(np.asarray(out).reshape(1, args.classes, -1, args.size // 4))
    classes, counts = np.unique(cmap, return_counts=True)
    print(f"inference {dt * 1e3:.2f} ms ({args.quant}); class map {cmap.shape}")
    for c, n in sorted(zip(classes, counts), key=lambda t: -t[1])[:8]:
        print(f"  class {c:3d}: {n:6d} px ({100.0 * n / cmap.size:.1f}%)")


if __name__ == "__main__":
    main()
