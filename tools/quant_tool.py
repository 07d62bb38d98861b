#!/usr/bin/env python
"""PTQ quantization tool — quant_tool_int8/uint8 equivalent
(tools/quantize/quant_tool_int8.cpp).

Loads an fp32 tmfile, calibrates on images (or random data), quantizes, and
writes a quantized tmfile. Also reports per-layer cosine similarity vs the
fp32 graph — the reference's "Step Evaluate" quality gate
(tools/quantize/README.md).

Usage:
    python tools/quant_tool.py -m fp32.tmfile -o int8.tmfile -t int8 -a kl \\
        -i calib_dir/ --input-shape 1,3,224,224
"""

import argparse
import glob
import os
import sys

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def load_calibration(args, shape):
    """Calibration batches: image dir (decoded via PIL if available) or
    synthetic random data."""
    if args.images and os.path.isdir(args.images):
        try:
            from tengine_tpu.utils.data import ImageBatchLoader, list_images

            files = list_images(args.images)[: args.num_images]
            loader = ImageBatchLoader(
                files, (shape[2], shape[3]), batch_size=1,
                mean=args.mean, scale=args.scale,
            )
            batches = [batch for batch, _ in loader]
            if batches:
                return batches
        except ImportError:
            print("PIL unavailable; falling back to random calibration", file=sys.stderr)
    rng = np.random.default_rng(0)
    return [rng.standard_normal(shape).astype(np.float32) for _ in range(args.num_images)]


def cosine_report(g, qg, x):
    """Per-layer cosine similarity fp32-vs-quantized (quant tool 'Step
    Evaluate' analog)."""
    import jax
    from tengine_tpu.executor.engine import ParamStore, build_forward
    from tengine_tpu.ops import qmath
    from tengine_tpu.utils.config import Options

    def run_all(graph, inp):
        store = ParamStore()
        fwd, _, _ = build_forward(graph, Options(), store, return_all=True)
        abstract = [jax.ShapeDtypeStruct(inp.shape, inp.dtype)]
        store.phase = "prepare"
        jax.eval_shape(fwd, {}, *abstract)
        params = {k: jax.numpy.asarray(v) for k, v in store.values.items()}
        store.phase = "trace"
        return jax.jit(fwd)(params, inp)

    env_f = run_all(g, x)
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(x, t_in.quant, t_in.dtype)
    env_q = run_all(qg, xq)

    print(f"{'tensor':40} {'cosine':>8}")
    for tid, arr in env_f.items():
        if tid not in env_q:
            continue
        t = qg.tensors[tid]
        a = np.asarray(arr, np.float32).reshape(-1)
        b = np.asarray(env_q[tid])
        if t.quant is not None and b.dtype in (np.uint8, np.int8):
            b = qmath.dequantize_np(b, t.quant)
        b = b.reshape(-1).astype(np.float32)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        cos = float(a @ b / denom) if denom > 0 else 1.0
        print(f"{t.name[:40]:40} {cos:8.4f}")


def top1_agreement(g, qg, inputs):
    """Top-1 agreement fp32 vs quantized over the calibration set — the
    measurable stand-in for BASELINE.json's 'top-1 Δ vs FP32 at the same
    bit-width' when no labeled dataset is wired in: a quantization whose
    argmax matches fp32 on every input has Δtop-1 = 0 on that set."""
    import tengine_tpu as tt
    from tengine_tpu.ops import qmath
    from tengine_tpu.utils.config import Options

    cg_f = tt.compile_graph(g, Options(precision="fp32"))
    cg_q = tt.compile_graph(qg, Options(quant_mode="fast"))
    t_in = qg.tensors[qg.input_tensors[0]]
    match = total = 0
    for x in inputs:
        (yf,) = cg_f.run(x)
        (yq,) = cg_q.run(qmath.quantize_np(x, t_in.quant, t_in.dtype))
        af = yf.reshape(yf.shape[0], -1).argmax(axis=1)
        aq = np.asarray(yq, np.float32).reshape(yq.shape[0], -1).argmax(axis=1)
        match += int((af == aq).sum())
        total += len(af)
    pct = 100.0 * match / max(total, 1)
    print(f"top-1 agreement fp32 vs quantized: {match}/{total} = {pct:.1f}%")
    return pct


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True, help="input fp32 tmfile")
    ap.add_argument("-o", "--output", required=True, help="output quantized tmfile")
    ap.add_argument("-t", "--type", default="uint8", choices=["uint8", "int8"])
    ap.add_argument("-a", "--algorithm", default="minmax",
                    choices=["minmax", "kl", "aciq"])
    ap.add_argument("-i", "--images", default=None, help="calibration image dir")
    ap.add_argument("-n", "--num-images", type=int, default=8)
    ap.add_argument("--input-shape", default=None, help="n,c,h,w if absent from model")
    ap.add_argument("--mean", type=float, nargs=3, default=[104.0, 117.0, 123.0])
    ap.add_argument("--scale", type=float, nargs=3, default=[1.0, 1.0, 1.0])
    ap.add_argument("--evaluate", action="store_true", help="per-layer cosine report")
    ap.add_argument("--dfq", action="store_true",
                    help="cross-layer weight equalization before quantizing "
                         "(quant_dfq.cpp analog)")
    ap.add_argument("--bias-correction", action="store_true",
                    help="empirical per-channel bias correction after "
                         "quantizing (quant_eq.cpp analog)")
    args = ap.parse_args()

    import tengine_tpu as tt
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.serializer.tm2.writer import save_tmfile

    g = tt.load_model(args.model)
    tid = g.input_tensors[0]
    if args.input_shape:
        g.tensors[tid].shape = [int(v) for v in args.input_shape.split(",")]
    shape = [int(d) for d in g.tensors[tid].shape]
    if not shape:
        ap.error("model has no input shape; pass --input-shape")

    calib = load_calibration(args, shape)
    print(f"calibrating on {len(calib)} batches, scheme={args.type}, "
          f"algorithm={args.algorithm}")
    if args.dfq:
        from tengine_tpu.quantize.dfq import equalize_graph

        n = equalize_graph(g)
        print(f"dfq: equalized {n} conv pairs")
    qg = quantize_graph(g, calib, scheme=args.type, algorithm=args.algorithm)
    if args.bias_correction:
        from tengine_tpu.quantize.dfq import bias_correction

        n = bias_correction(g, qg, calib)
        print(f"bias-correction: adjusted {n} nodes")
    save_tmfile(qg, args.output)
    print(f"wrote {args.output}")

    if args.evaluate:
        cosine_report(g, qg, calib[0])
        if len(g.output_tensors) == 1:
            top1_agreement(g, qg, calib)


if __name__ == "__main__":
    main()
