#!/usr/bin/env python
"""Full YOLOv3 / YOLO-Fastest demo — tm_yolov3 / tm_yolofastest equivalent
(examples/tm_yolov3.cpp, tm_yolofastest.cpp).

Darknet-53 + 3-scale heads (or the ultra-light dw-separable yolo-fastest
with 2 heads), built from generated darknet cfg through the darknet
front-end; anchor decode + native C++ NMS on the host.

    python examples/tm_yolov3_full.py [--fastest] [-q int8] [-i img.jpg]
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
    ap.add_argument("-s", "--size", type=int, default=0)
    ap.add_argument("-t", "--threshold", type=float, default=0.25)
    ap.add_argument("--fastest", action="store_true", help="YOLO-Fastest instead")
    args = ap.parse_args()

    import tengine_tpu as tt
    from tengine_tpu import native
    from tengine_tpu.models.darknet_zoo import (
        build_yolofastest_graph,
        build_yolov3_graph,
        decode_darknet_yolo,
    )
    from tengine_tpu.utils.config import Options

    size = args.size or (320 if args.fastest else 416)
    g = (build_yolofastest_graph if args.fastest else build_yolov3_graph)(img=size)
    yolo_params = [n.params for n in g.nodes if n.op == "Dropout" and "classes" in n.params]

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("RGB").resize((size, size))
        ).astype(np.float32)
        x = (img / 255.0).transpose(2, 0, 1)[None]
    else:
        x = np.random.default_rng(0).standard_normal((1, 3, size, size)).astype(
            np.float32
        )

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

    dets = decode_darknet_yolo(
        [np.asarray(o) for o in outs], yolo_params, size, args.threshold
    )
    if len(dets):
        keep = native.nms(dets[:, :4], dets[:, 4], iou_threshold=0.45)
        dets = dets[keep]
    net = "yolo-fastest" if args.fastest else "yolov3"
    print(f"{net} inference {dt * 1e3:.2f} ms ({args.quant}); {len(dets)} detections")
    for x0, y0, x1, y1, s, c in dets[:20]:
        print(f"  cls {int(c):3d}  score {s:.3f}  box ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")


if __name__ == "__main__":
    main()
