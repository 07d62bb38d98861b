#!/usr/bin/env python
"""Measure every reference benchmark net on the TPU and emit the BASELINE.md
same-host table data (VERDICT r2 item 4): fp32 batch-1 p50 latency, plus
uint8 (MinMax) and int8 (KL) batch-128 throughput and batch-1 p50 per net.

Writes results incrementally to baseline_table.json so a partial run is
still usable. Re-running skips configs already present (delete the file to
remeasure).

Usage: python tools/fill_baseline.py [--out baseline_table.json]
"""

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(model, scheme, batch):
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
        opts = Options(quant_mode="fast", batch_size=batch)
    else:
        qg = g
        opts = Options(precision=scheme, batch_size=batch)
    cg = tt.compile_graph(qg, opts)
    t_in = qg.tensors[qg.input_tensors[0]]
    shape[0] = batch
    if scheme in ("uint8", "int8"):
        x = jax.device_put(
            qmath.quantize_np(np.broadcast_to(calib[0], shape), t_in.quant, t_in.dtype)
        )
    else:
        x = jax.device_put(np.broadcast_to(calib[0], shape).astype(np.float32))

    def sync(out):
        arr = out[0]
        return float(np.asarray(arr[(0,) * arr.ndim]))

    sync(cg(x))
    compile_s = time.perf_counter() - t0

    # One blessed measurement for every published table (ADVICE r3 item 4,
    # VERDICT r3 item 3): batch-1 rows use the trace method (pure device
    # module time +- sigma; see bench.measure_device_ms_trace docstring for
    # why the slope method cannot measure sub-ms nets through the tunnel),
    # throughput rows the pipelined slope method.
    from bench import measure_b1_ms, measure_device_ms

    if batch == 1:
        ms, sigma, method = measure_b1_ms(lambda: cg(x), sync)
    else:
        ms, sigma, method = measure_device_ms(lambda: cg(x), sync), None, "slope"
    r = {"ms": ms, "img_s": batch / ms * 1e3, "compile_s": compile_s}
    if sigma is not None:
        r["sigma_ms"] = sigma
    if batch == 1 and method != "trace":
        r["method"] = method  # non-blessed fallback: tagged, never silent
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baseline_table.json"))
    args = ap.parse_args()

    from tengine_tpu.models.zoo import BENCHMARK_MODELS

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    configs = []
    for model in BENCHMARK_MODELS:
        configs += [
            (model, "fp32_fast", 1),
            (model, "uint8", 1),
            (model, "uint8", 128),
            (model, "int8", 128),
        ]
    for model, scheme, batch in configs:
        key = f"{model}|{scheme}|b{batch}"
        if key in results:
            print(f"skip {key}", flush=True)
            continue
        try:
            r = measure(model, scheme, batch)
            results[key] = r
            print(f"RESULT {key}: {r['ms']:.3f} ms, {r['img_s']:.0f} img/s "
                  f"(compile {r['compile_s']:.0f}s)", flush=True)
        except Exception as e:
            results[key] = {"error": str(e)}
            print(f"ERROR {key}: {e}", flush=True)
            traceback.print_exc()
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
