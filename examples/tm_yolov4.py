#!/usr/bin/env python
"""yolov4-tiny demo — tm_yolov4_tiny equivalent (tests/models/test_model_yolov4_tiny.cpp).

Builds the net from its darknet cfg through the darknet front-end (CSP
grouped routes, leaky-relu, two yolo heads), runs fp32 or quantized, and
decodes + NMS on the host.

    python examples/tm_yolov4.py [-q int8] [-s 416] [-i img.jpg]
    python examples/tm_yolov4.py --cfg x.cfg --weights x.weights -i img.jpg
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
    ap.add_argument("-t", "--threshold", type=float, default=0.25)
    ap.add_argument("--cfg", default=None, help="real darknet cfg (optional)")
    ap.add_argument("--weights", default=None, help="real darknet weights (optional)")
    args = ap.parse_args()

    import tengine_tpu as tt
    from tengine_tpu import native
    from tengine_tpu.models.darknet_zoo import (
        build_yolov4_tiny_graph,
        decode_darknet_yolo,
    )
    from tengine_tpu.utils.config import Options

    if args.cfg:
        from tengine_tpu.convert.darknet_frontend import from_darknet

        g = from_darknet(args.cfg, args.weights)
    else:
        g = build_yolov4_tiny_graph(img=args.size)
    yolo_params = [n.params for n in g.nodes if n.op == "Dropout" and "classes" in n.params]

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((args.size, args.size))
        ).astype(np.float32)
        x = (img / 255.0).transpose(2, 0, 1)[None]
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

    dets = decode_darknet_yolo(outs, yolo_params, args.size, args.threshold)
    if len(dets):
        keep = native.nms(dets[:, :4], dets[:, 4], iou_threshold=0.45)
        dets = dets[keep]
    print(f"inference {dt * 1e3:.2f} ms ({args.quant}); {len(dets)} detections")
    for x0, y0, x1, y1, s, c in dets[:20]:
        print(f"  cls {int(c):3d}  score {s:.3f}  box ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")


if __name__ == "__main__":
    main()
