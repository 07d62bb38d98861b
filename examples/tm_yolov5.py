#!/usr/bin/env python
"""YOLOv5s detection demo — tm_yolov5s equivalent (examples/tm_yolov5s.cpp).

The reference needs offline ONNX surgery (tools/optimize/yolov5s-opt.py) to
strip the Focus slices before converting; here the full graph — Focus
slices, SiLU, SPP, PANet upsample/concat, three heads — runs on the TPU,
and only the anchor decode + NMS run host-side (matching the reference
app's post-processing, tm_yolov5s.cpp).

    python examples/tm_yolov5.py [-i img.jpg] [-q int8] [-s 640] [-t 0.25]

With no image an uint8-noise frame is used (smoke/demo mode). The model is
the clean-room YOLOv5s with seeded random weights (the reference benchmarks
weight-stripped nets the same way); pass -m model.tmfile to run converted
real weights instead.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tm_yolo import COCO80, nms, sigmoid  # noqa: E402


def decode_v5_head(out, anchors, stride, conf_th):
    """[1, 3*(5+nc), g, g] raw map -> [N,6] (x0,y0,x1,y1,score,cls).
    yolov5 box decode: xy = (2*sig(t)-0.5+grid)*stride, wh = (2*sig(t))^2*anchor."""
    _, ch, gh, gw = out.shape
    nc = ch // 3 - 5
    out = out.reshape(3, 5 + nc, gh, gw)
    p = sigmoid(out)
    boxes = []
    for a, (aw, ah) in enumerate(anchors):
        obj = p[a, 4]
        ys, xs = np.where(obj > conf_th)
        for y, x in zip(ys, xs):
            scores = obj[y, x] * p[a, 5:, y, x]
            c = int(np.argmax(scores))
            score = float(scores[c])
            if score < conf_th:
                continue
            bx = (2 * p[a, 0, y, x] - 0.5 + x) * stride
            by = (2 * p[a, 1, y, x] - 0.5 + y) * stride
            bw = (2 * p[a, 2, y, x]) ** 2 * aw
            bh = (2 * p[a, 3, y, x]) ** 2 * ah
            boxes.append([bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2, score, c])
    return np.asarray(boxes, np.float32).reshape(-1, 6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default=None, help="tmfile (default: built-in yolov5s)")
    ap.add_argument("-i", "--image", default=None)
    ap.add_argument("-s", "--size", type=int, default=640)
    ap.add_argument("-t", "--threshold", type=float, default=0.25)
    ap.add_argument("-q", "--quant", choices=["fp32", "int8", "uint8"], default="fp32")
    args = ap.parse_args()

    import tengine_tpu as tt
    from tengine_tpu.models.yolov5 import YOLOV5_ANCHORS, YOLOV5_STRIDES
    from tengine_tpu.utils.config import Options

    if args.image:
        from PIL import Image

        from tengine_tpu import native

        img = np.asarray(Image.open(args.image).convert("RGB"))
        img = native.letterbox(img, args.size, args.size)  # native improc.cc
        x = (img.astype(np.float32) / 255.0).transpose(2, 0, 1)[None]
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
        from tengine_tpu.models.yolov5 import build_yolov5s_graph

        _, g = build_yolov5s_graph(num_classes=80, img=args.size)

    if args.quant != "fp32":
        from tengine_tpu.quantize.quantizer import quantize_graph

        qg = quantize_graph(g, [x.astype(np.float32)], scheme=args.quant)
        from tengine_tpu.ops import qmath

        t_in = qg.tensors[qg.input_tensors[0]]
        xin = qmath.quantize_np(x.astype(np.float32), t_in.quant, t_in.dtype)
        session = tt.compile_graph(qg, Options(quant_mode="fast"))
        outs = session.run(xin)  # warm/compile
        t0 = time.time()
        outs = session.run(xin)
        outs = [
            qmath.dequantize_np(
                np.asarray(o, np.float32), qg.tensors[qg.nodes[i].outputs[0]].quant
            )
            for i, o in zip(qg.outputs, outs)
        ]
    else:
        session = tt.compile_graph(g, Options())
        session.run(x.astype(np.float32))  # warm/compile
        t0 = time.time()
        outs = session.run(x.astype(np.float32))
    print(f"inference: {(time.time()-t0)*1e3:.2f} ms ({args.quant})")

    heads = sorted((o for o in outs if o.ndim == 4), key=lambda o: -o.shape[2])
    all_boxes = np.concatenate(
        [
            decode_v5_head(o, YOLOV5_ANCHORS[i], YOLOV5_STRIDES[i], args.threshold)
            for i, o in enumerate(heads)
        ],
        axis=0,
    )
    dets = nms(all_boxes)
    for x0, y0, x1, y1, score, c in dets:
        name = COCO80[int(c)] if int(c) < len(COCO80) else f"class{int(c)}"
        print(f"{name:14s} {score*100:5.1f}%  [{x0:6.1f}, {y0:6.1f}, {x1:6.1f}, {y1:6.1f}]")
    print(f"{len(dets)} detections >= {args.threshold}")


if __name__ == "__main__":
    main()
