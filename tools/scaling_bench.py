#!/usr/bin/env python
"""Scaling-efficiency benchmark: throughput vs mesh size (1 -> N devices).

The reference's analogous claim is thread scaling (1t -> 4t, ~2.8-3.2x on
conv nets, benchmark/README.md); ours is device scaling over the mesh
(BASELINE north star: >=90% efficiency to 2 hosts). DP shards the batch over
"data"; TP shards large conv/FC weights over "model" (parallel/sharding.py).

On real TPU hardware this measures ICI scaling; on a CPU host it runs on
virtual devices (--virtual N) — numbers are then only a harness check, but
output equality vs the single-device run is still asserted.

    python tools/scaling_bench.py --virtual 8 --model squeezenet_v1.1 \\
        --hw 64 --batch 32 --meshes 1x1,2x1,4x1,8x1
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(call, sync, n=9, trials=3):
    sync(call())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = call()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force CPU with N virtual devices (test mode)")
    ap.add_argument("--model", default="squeezenet_v1.1")
    ap.add_argument("--hw", type=int, default=64, help="input H=W")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--meshes", default=None,
                    help="comma list of DxM (data x model), default 1..n_dev x1")
    args = ap.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)

    import tengine_tpu as tt
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.parallel.mesh import make_mesh
    from tengine_tpu.parallel.sharding import shard_compiled
    from tengine_tpu.utils.config import Options

    n_dev = len(jax.devices())
    if args.meshes:
        meshes = []
        for s in args.meshes.split(","):
            d, m = s.lower().split("x")
            meshes.append((int(d), int(m)))
    else:
        meshes = []
        d = 1
        while d <= n_dev:
            meshes.append((d, 1))
            d *= 2

    g = load_benchmark_model(args.model, fill_missing_weights="random")
    for tid in g.input_tensors:
        g.tensors[tid].shape = [1, 3, args.hw, args.hw]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((args.batch, 3, args.hw, args.hw)).astype(np.float32)

    cg = tt.compile_graph(g, Options(batch_size=args.batch))

    def sync(out):
        return float(np.asarray(out[0]).reshape(-1)[0])

    base_ips = None
    ref_out = None
    print(f"{'mesh (dxm)':>12} {'ms/iter':>9} {'img/s':>9} {'scaling':>8} {'eff':>6}")
    for d, m in meshes:
        if d * m > n_dev:
            continue
        if args.batch % max(d, 1):
            continue
        mesh = make_mesh(jax.devices()[: d * m], shape=(d, m))
        scg = shard_compiled(cg, mesh)
        xs = jax.device_put(x)
        out = np.asarray(scg(xs)[0])
        if ref_out is None:
            ref_out = out
        else:
            np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)
        sec = measure(lambda: scg(xs), sync)
        ips = args.batch / sec
        if base_ips is None:
            base_ips = ips / (d * m)
        scaling = ips / (base_ips)
        eff = scaling / (d * m)
        print(f"{d:>9}x{m:<2} {sec*1e3:9.2f} {ips:9.0f} {scaling:7.2f}x {eff*100:5.0f}%")


if __name__ == "__main__":
    main()
