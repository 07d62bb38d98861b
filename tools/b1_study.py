#!/usr/bin/env python
"""Batch-1 latency measurement study (VERDICT r3 item 3).

Three published MobileNet-v1-uint8-b1 numbers disagreed by 5.4x
(0.17 / 0.399 / 0.922 ms) and the face-pipeline config moved -44% on a
measurement change alone. This script settles the method on-chip:

  A. (1,n)-slope     — the r3 method: per-iter = (t_n - t_1)/(n-1)
  B. (n1,n2)-slope   — difference two LARGE dispatch counts so the constant
                       offset (sync RTT + dispatch ramp) cancels and each
                       endpoint is >= target_ms of device work
  C. trace oracle    — XLA device trace total self-time / iterations
                       (ground truth, too heavy for routine benching)

Each method runs `trials` times; we report median / min / stdev. The
blessed method is whichever matches the trace oracle with the lowest
run-to-run stdev — spoiler from the runs recorded in BASELINE.md: (B).

Usage: python tools/b1_study.py [model] [scheme] [batch]
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup(model, scheme, batch):
    import jax
    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    rng = np.random.default_rng(0)
    g = load_benchmark_model(model, fill_missing_weights="random")
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    calib = [rng.standard_normal(shape).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme=scheme, algorithm="minmax")
    cg = tt.compile_graph(qg, Options(quant_mode="fast", batch_size=batch))
    t_in = qg.tensors[qg.input_tensors[0]]
    shape[0] = batch
    xq = jax.device_put(
        qmath.quantize_np(np.broadcast_to(calib[0], shape), t_in.quant, t_in.dtype)
    )

    def call():
        return cg(xq)

    def sync(out):
        arr = out[0]
        return float(np.asarray(arr[(0,) * arr.ndim]))

    return call, sync


def run_n(call, sync, k):
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = call()
    sync(out)
    return time.perf_counter() - t0


def method_a(call, sync, n=41, trials=7):
    vals = []
    for _ in range(trials):
        t1 = min(run_n(call, sync, 1) for _ in range(3))
        tn = min(run_n(call, sync, n) for _ in range(3))
        vals.append((tn - t1) / (n - 1) * 1e3)
    return vals


def method_b(call, sync, est_ms, target_ms=150.0, trials=7):
    n1 = max(8, int(target_ms / max(est_ms, 1e-3)))
    n2 = 2 * n1
    vals = []
    for _ in range(trials):
        t1 = min(run_n(call, sync, n1) for _ in range(2))
        t2 = min(run_n(call, sync, n2) for _ in range(2))
        vals.append((t2 - t1) / (n2 - n1) * 1e3)
    return vals


def method_c(call, sync, iters=200):
    """Trace oracle: total TPU-plane self time of the jit program events."""
    import glob
    import tempfile

    import jax

    d = tempfile.mkdtemp(prefix="b1trace")
    run_n(call, sync, 3)  # warm
    with jax.profiler.trace(d):
        run_n(call, sync, iters)
    paths = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None
    from tpu_trace import parse_xplane

    total_ps = 0
    for name, dur_ps, cnt in parse_xplane(paths[0]):
        total_ps += dur_ps
    return total_ps / 1e9 / iters


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "mobilenetv1"
    scheme = sys.argv[2] if len(sys.argv) > 2 else "uint8"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    call, sync = setup(model, scheme, batch)
    run_n(call, sync, 3)  # warm + compile

    a = method_a(call, sync)
    est = statistics.median(a)
    b = method_b(call, sync, est)
    for name, vals in (("A (1,n)-slope", a), ("B (n1,2n1)-slope", b)):
        print(
            f"{name:20s} median {statistics.median(vals):.4f} ms  "
            f"min {min(vals):.4f}  stdev {statistics.stdev(vals):.4f}  "
            f"({[round(v, 4) for v in vals]})"
        )
    c = method_c(call, sync)
    if c is not None:
        print(f"{'C trace oracle':20s} {c:.4f} ms (device self-time/iter)")


if __name__ == "__main__":
    main()
