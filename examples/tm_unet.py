#!/usr/bin/env python
"""U-Net segmentation demo — tm_unet equivalent (examples/tm_unet.cpp).

Runs the built-in seeded U-Net (or a converted tmfile via -m) fp32 or
quantized, prints per-class pixel counts and the fp32/quantized mask
agreement — the reference app prints the argmax mask the same way.

    python examples/tm_unet.py [-s 256] [-q uint8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("-i", "--image", default=None)
    ap.add_argument("-s", "--size", type=int, default=256)
    ap.add_argument("-q", "--quant", choices=["fp32", "int8", "uint8"], default="fp32")
    ap.add_argument("-c", "--classes", type=int, default=2)
    args = ap.parse_args()

    import tengine_tpu as tt
    from tengine_tpu.utils.config import Options

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.size, args.size))
        ).astype(np.float32)
        x = (img / 255.0).transpose(2, 0, 1)[None]
    else:
        x = (
            np.random.default_rng(0)
            .integers(0, 255, (1, 3, args.size, args.size))
            .astype(np.float32)
            / 255.0
        )

    if args.model:
        g = tt.load_model(args.model)
        for tid in g.input_tensors:
            if not g.tensors[tid].shape:
                g.tensors[tid].shape = [1, 3, args.size, args.size]
    else:
        from tengine_tpu.models.extra import build_unet_graph

        _, g = build_unet_graph(num_classes=args.classes, img=args.size)

    fp_session = tt.compile_graph(g, Options(precision="fp32"))
    fp_session.run(x.astype(np.float32))  # warm
    t0 = time.time()
    (fp_out,) = fp_session.run(x.astype(np.float32))
    print(f"fp32 inference: {(time.time()-t0)*1e3:.2f} ms")
    mask = fp_out.reshape(1, args.classes, args.size, args.size).argmax(1)

    if args.quant != "fp32":
        from tengine_tpu.ops import qmath
        from tengine_tpu.quantize.quantizer import quantize_graph

        qg = quantize_graph(g, [x.astype(np.float32)], scheme=args.quant)
        t_in = qg.tensors[qg.input_tensors[0]]
        xq = qmath.quantize_np(x.astype(np.float32), t_in.quant, t_in.dtype)
        qs = tt.compile_graph(qg, Options(quant_mode="fast"))
        qs.run(xq)
        t0 = time.time()
        (q_out,) = qs.run(xq)
        print(f"{args.quant} inference: {(time.time()-t0)*1e3:.2f} ms")
        t_out = qg.tensors[qg.nodes[qg.outputs[0]].outputs[0]]
        deq = qmath.dequantize_np(np.asarray(q_out, np.float32), t_out.quant)
        qmask = deq.reshape(1, args.classes, args.size, args.size).argmax(1)
        agree = (qmask == mask).mean()
        print(f"quantized mask agreement vs fp32: {agree*100:.2f}%")
        mask = qmask

    for c in range(args.classes):
        print(f"class {c}: {(mask == c).sum()} px")


if __name__ == "__main__":
    main()
