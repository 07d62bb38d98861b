#!/usr/bin/env python
"""Persistent-cache warmer + cold-compile profiler (VERDICT r2 item 7).

Compiles the benchmark configurations (without running them) so the XLA
persistent cache (~/.cache/tengine_tpu/xla, on by default) is hot for
serving/bench starts, and reports per-net compile wall time — the direct
measurement of where time-to-first-inference goes.

On this dev environment the compile happens server-side over the TPU
tunnel; cold compiles are minutes per net (Mosaic kernels add more), warm
starts are milliseconds. Run this once after changing kernels/options:

    python tools/precompile.py [--configs mobilenetv1_uint8_128 ...]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # name, model, scheme/precision, algorithm, batch
    ("mobilenetv1_fp32fast_1", "mobilenetv1", "fp32_fast", None, 1),
    ("mobilenetv1_uint8_1", "mobilenetv1", "uint8", "minmax", 1),
    ("mobilenetv1_uint8_128", "mobilenetv1", "uint8", "minmax", 128),
    ("resnet50_int8_128", "resnet50", "int8", "kl", 128),
    ("mssd_uint8_8", "mssd", "uint8", "minmax", 8),
    ("retinaface_uint8_1", "retinaface", "uint8", "minmax", 1),
    ("mobilefacenets_uint8_8", "mobilefacenets", "uint8", "minmax", 8),
]


def build(model, scheme, algorithm, batch):
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    rng = np.random.default_rng(0)
    g = load_benchmark_model(model, fill_missing_weights="random")
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    if scheme in ("uint8", "int8"):
        calib = [rng.standard_normal(shape).astype(np.float32)]
        qg = quantize_graph(g, calib, scheme=scheme, algorithm=algorithm)
        return tt.compile_graph(qg, Options(quant_mode="fast", batch_size=batch))
    return tt.compile_graph(g, Options(precision=scheme, batch_size=batch))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=None)
    ap.add_argument("--opts", nargs="*", default=[],
                    help="Options overrides k=v applied to every config")
    args = ap.parse_args()

    import jax

    total0 = time.perf_counter()
    for name, model, scheme, algorithm, batch in CONFIGS:
        if args.configs and name not in args.configs:
            continue
        t0 = time.perf_counter()
        try:
            cg = build(model, scheme, algorithm, batch)
            t_build = time.perf_counter() - t0
            # AOT compile without executing (no device inputs needed)
            in_spec = [
                jax.ShapeDtypeStruct(tuple(
                    batch if i == 0 else int(d)
                    for i, d in enumerate(cg.graph.tensors[tid].shape)
                ), cg.graph.tensors[tid].dtype.np)
                for tid in cg.input_ids
            ]
            t1 = time.perf_counter()
            cg._fn.lower(cg.params, *in_spec).compile()
            t_comp = time.perf_counter() - t1
            print(f"[precompile] {name}: trace/quantize {t_build:.1f}s, "
                  f"xla compile {t_comp:.1f}s", flush=True)
        except Exception as e:
            print(f"[precompile] {name}: FAILED {e}", flush=True)
    print(f"[precompile] total {time.perf_counter()-total0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
