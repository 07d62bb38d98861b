#!/usr/bin/env python
"""Chain-vs-XLA scan for the relaxed tier (one process, quantize once):
resnet50 int8 b128 across storage/chain configs. TT_CHAIN_CMID restricts
which stages fuse (by c_mid)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import tengine_tpu as tt
    from bench import measure_device_ms, _sync_out
    from tengine_tpu.models.zoo import load_benchmark_model
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    model = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    algo = sys.argv[2] if len(sys.argv) > 2 else "minmax"
    rng = np.random.default_rng(0)
    g = load_benchmark_model(model, fill_missing_weights="random")
    shape = [int(d) for d in g.tensors[g.input_tensors[0]].shape]
    calib = [rng.standard_normal(shape).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="int8", algorithm=algo)
    t_in = qg.tensors[qg.input_tensors[0]]
    shape[0] = 128
    xq = jax.device_put(
        qmath.quantize_np(np.broadcast_to(calib[0], shape), t_in.quant, t_in.dtype)
    )

    configs = [
        ("xla-exact", False, "0"),
        ("xla-relaxed", True, "0"),
        ("relaxed-chain-128,256,512", True, "128,256,512"),
        ("relaxed-chain-256,512", True, "256,512"),
        ("relaxed-chain-all", True, None),
    ]
    for name, relaxed, cmid in configs:
        if cmid:
            os.environ["TT_CHAIN_CMID"] = cmid
        else:
            os.environ.pop("TT_CHAIN_CMID", None)
        try:
            cg = tt.compile_graph(
                qg, Options(quant_mode="fast", batch_size=128, quant_relaxed=relaxed)
            )
            ms = measure_device_ms(lambda: cg(xq), _sync_out, n=21)
            print(f"{name:22s} {ms:7.3f} ms  {128/ms*1e3:6.0f} img/s", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
