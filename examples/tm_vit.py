#!/usr/bin/env python
"""ViT classification demo — transformer analog of tm_classification
(examples/tm_classification.c).

Plain ViT: conv patch embed + positional embedding + pre-norm attention
blocks + token mean-pool head, all lowered to one jitted XLA program
(attention = batched MXU matmuls).

    python examples/tm_vit.py [-q int8] [-s 224] [-i img.jpg]
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
    ap.add_argument("-s", "--size", type=int, default=224)
    args = ap.parse_args()

    import torch

    import tengine_tpu as tt
    from tengine_tpu.models.transformer_zoo import build_vit_graph
    from tengine_tpu.utils.config import Options

    torch.manual_seed(0)
    _, g = build_vit_graph(num_classes=1000, img=args.size)

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.size, args.size))
        ).astype(np.float32)
        x = ((img / 255.0 - 0.5) / 0.5).transpose(2, 0, 1)[None]
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

    logits = np.asarray(out).ravel()
    top5 = logits.argsort()[-5:][::-1]
    print(f"inference {dt * 1e3:.2f} ms ({args.quant})")
    for i in top5:
        print(f"  class {i:4d}: {logits[i]:.4f}")


if __name__ == "__main__":
    main()
