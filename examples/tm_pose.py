#!/usr/bin/env python
"""Human-pose demo — tm_alphapose equivalent (tests/models/test_model_alphapose.cpp).

Runs the built-in seeded FastPose-style network (resnet bottlenecks +
DUC pixel-shuffle upsampling -> 17 COCO keypoint heatmaps), fp32 or
quantized, and prints the argmax-decoded keypoints the way the reference
test prints its pose vector.

    python examples/tm_pose.py [-q int8] [-i img.jpg]
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
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=192)
    args = ap.parse_args()

    import torch

    import tengine_tpu as tt
    from tengine_tpu.models.detect_zoo import build_fastpose_graph, decode_pose_heatmaps
    from tengine_tpu.utils.config import Options

    torch.manual_seed(0)
    _, g = build_fastpose_graph(img_h=args.height, img_w=args.width)

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.width, args.height))
        ).astype(np.float32)
        x = ((img / 255.0 - 0.48) / 0.23).transpose(2, 0, 1)[None]
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
        t_out = qg.tensors[[qg.nodes[i].outputs[0] for i in qg.outputs][0]]
        xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
        t0 = time.time()
        (hm,) = cg.run(xq)
        dt = time.time() - t0
        hm = qmath.dequantize_np(np.asarray(hm, np.float32), t_out.quant)
    else:
        cg = tt.compile_graph(g, Options(precision="fp32"))
        t0 = time.time()
        (hm,) = cg.run(x)
        dt = time.time() - t0

    kps, scores = decode_pose_heatmaps(hm.reshape(1, 17, args.height // 4, args.width // 4))
    print(f"inference {dt * 1e3:.2f} ms ({args.quant})")
    for name, (px, py), s in zip(COCO_JOINTS, kps[0], scores[0]):
        print(f"  {name:11s} ({px:6.1f}, {py:6.1f})  score {s:+.3f}")


if __name__ == "__main__":
    main()
