#!/usr/bin/env python
"""Quick single-net device-time measurement (slope method, same as bench.py).

Usage: python tools/quick_bench.py model scheme batch [opt=val ...]
  opt=val pairs are forwarded to Options (int/bool/str coerced).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    model = sys.argv[1]
    scheme = sys.argv[2]
    batch = int(sys.argv[3])
    over = {}
    for kv in sys.argv[4:]:
        k, v = kv.split("=", 1)
        if v in ("True", "False"):
            v = v == "True"
        else:
            try:
                v = int(v)
            except ValueError:
                pass
        over[k] = v

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
    t0 = time.perf_counter()
    if scheme in ("uint8", "int8"):
        qg = quantize_graph(
            g, calib, scheme=scheme,
            algorithm="kl" if scheme == "int8" else "minmax",
        )
        opts = Options(quant_mode="fast", batch_size=batch, **over)
    else:
        qg = g
        opts = Options(precision=scheme, batch_size=batch, **over)
    cg = tt.compile_graph(qg, opts)
    t_in = qg.tensors[qg.input_tensors[0]]
    shape[0] = batch
    if scheme in ("uint8", "int8"):
        x = jax.device_put(
            qmath.quantize_np(
                np.broadcast_to(calib[0], shape), t_in.quant, t_in.dtype
            )
        )
    else:
        x = jax.device_put(np.broadcast_to(calib[0], shape).astype(np.float32))
    def sync(out):
        # block_until_ready does not actually wait through the axon tunnel;
        # fetching one scalar to the host is the reliable sync (bench.py)
        arr = out[0]
        return float(np.asarray(arr[(0,) * arr.ndim]))

    sync(cg(x))
    compile_s = time.perf_counter() - t0

    def run_n(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = cg(x)
        sync(o)
        return time.perf_counter() - t0

    n = 41
    t1 = min(run_n(1) for _ in range(3))
    tn = min(run_n(n) for _ in range(3))
    ms = (tn - t1) / (n - 1) * 1e3
    if ms <= 0:
        ms = tn / n * 1e3
    print(
        f"RESULT {model} {scheme} b{batch} {over}: {ms:.3f} ms/iter, "
        f"{batch / ms * 1e3:.0f} img/s  (compile+quant {compile_s:.1f}s)"
    )


if __name__ == "__main__":
    main()
