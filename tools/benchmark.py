#!/usr/bin/env python
"""tm_benchmark equivalent (benchmark/tm_benchmark.cc): run the reference's
benchmark tmfiles on the TPU and print a min/avg latency table.

Usage:
    python tools/benchmark.py                 # all nets, fp32
    python tools/benchmark.py -m mobilenetv1 -b 8 -p bf16
    python tools/benchmark.py --uint8        # full-integer quantized run
"""

import argparse
import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def measure(call, sync, n=21, trials=3, warmup=2):
    """Pipelined-dispatch slope timing (see bench.py for why)."""
    for _ in range(warmup):
        sync(call())

    def run_n(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = call()
        sync(out)
        return time.perf_counter() - t0

    vals = []
    for _ in range(trials):
        t1 = run_n(1)
        tn = run_n(n)
        vals.append((tn - t1) / (n - 1))
    return min(vals) * 1e3, float(np.mean(vals)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default=None, help="single net name (default: all)")
    ap.add_argument("-b", "--batch", type=int, default=1)
    ap.add_argument("-p", "--precision", default="fp32_fast",
                    choices=["fp32", "fp32_fast", "bf16"])
    ap.add_argument("--uint8", action="store_true", help="quantize (MinMax) and run UINT8")
    ap.add_argument("-r", "--repeat", type=int, default=21)
    args = ap.parse_args()

    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import BENCHMARK_MODELS, load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    names = [args.model] if args.model else list(BENCHMARK_MODELS)
    rng = np.random.default_rng(0)
    mode = "uint8" if args.uint8 else args.precision
    print(f"tengine-tpu benchmark  batch={args.batch} mode={mode} "
          f"device={jax.devices()[0]}")
    print(f"{'model':20} {'min(ms)':>10} {'avg(ms)':>10} {'img/s':>10}")

    for name in names:
        try:
            g = load_benchmark_model(name, fill_missing_weights="random")
            shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
            if args.uint8:
                calib = [rng.standard_normal(shape).astype(np.float32)]
                g = quantize_graph(g, calib, scheme="uint8")
                cg = tt.compile_graph(g, Options(quant_mode="fast", batch_size=args.batch))
                t_in = g.tensors[g.input_tensors[0]]
                shape[0] = args.batch
                x = jax.device_put(qmath.quantize_np(
                    rng.standard_normal(shape).astype(np.float32), t_in.quant, t_in.dtype))
            else:
                cg = tt.compile_graph(
                    g, Options(precision=args.precision, batch_size=args.batch)
                )
                shape[0] = args.batch
                x = jax.device_put(rng.standard_normal(shape).astype(np.float32))

            def sync(out):
                arr = out[0]
                return float(jax.numpy.asarray(arr).reshape(-1)[0].astype(jax.numpy.float32))

            mn, avg = measure(lambda: cg(x), sync, n=args.repeat)
            print(f"{name:20} {mn:10.3f} {avg:10.3f} {args.batch/mn*1e3:10.0f}")
        except Exception as e:
            print(f"{name:20} FAILED: {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
