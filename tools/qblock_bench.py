#!/usr/bin/env python
"""µ-benchmark of the fused residual-block-chain Pallas kernel (qblock.py)
on the real TPU: per-stage ResNet-50 geometries, correctness vs the numpy
oracle at small batch, then throughput at batch 128.

Usage: python tools/qblock_bench.py [stage2 stage3 stage4 stage1]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tengine_tpu.ops.pallas.qblock import (  # noqa: E402
    QBlock, build_block_args, pack_activations, qblock_chain,
    seg_geometry, unpack_activations,
)
from tests.test_qblock_pallas import make_block, ref_block  # noqa: E402

STAGES = {
    # name: (H, W, c_in, c_mid, c_out, n_identity_blocks, first_proj)
    "stage1": (56, 56, 256, 64, 256, 2, False),
    "stage1p": (56, 56, 64, 64, 256, 3, True),  # incl. stride-1 proj block0
    "stage2": (28, 28, 512, 128, 512, 3, False),
    "stage3": (14, 14, 1024, 256, 1024, 5, False),
    "stage3a": (14, 14, 1024, 256, 1024, 3, False),
    "stage4": (7, 7, 2048, 512, 2048, 2, False),
    "stage4a": (7, 7, 2048, 512, 2048, 1, False),
}


def build_chain(rng, H, W, c0, c_mid, c_out, nblocks, first_proj):
    blocks, all_ws, all_args = [], [], []
    s_prev = 0.02
    cin = c0
    for i in range(nblocks):
        proj = first_proj and i == 0
        blk, ws = make_block(rng, cin, c_mid, c_out, proj, s_prev)
        blocks.append(blk)
        all_ws.append(ws)
        all_args += build_block_args(
            blk, ws["w1"], ws["b1"], ws["w2"], ws["b2"], ws["w3"], ws["b3"],
            s_prev, ws["sw1"], ws["sw2"], ws["sw3"],
            w4=ws.get("w4"), b4_q=ws.get("b4"), sw4=ws.get("sw4"),
        )
        s_prev = blk.s_relu
        cin = c_out
    return tuple(blocks), all_ws, all_args


def main():
    import jax

    names = sys.argv[1:] or ["stage2", "stage3", "stage4", "stage1"]
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    for name in names:
        H, W, c0, c_mid, c_out, nb, proj = STAGES[name]
        seg, g = seg_geometry(W)
        blocks, all_ws, all_args = build_chain(rng, H, W, c0, c_mid, c_out, nb, proj)
        args_dev = [jax.device_put(a) for a in all_args]

        # correctness at minimum batch
        N = 2 * g
        x = rng.integers(-127, 128, (N, H, W, c0)).astype(np.int8)
        ref = x
        s_prev = 0.02
        for blk, ws in zip(blocks, all_ws):
            ref = ref_block(
                ref, blk, ws["w1"], ws["b1"], ws["sw1"], ws["w2"], ws["b2"],
                ws["sw2"], ws["w3"], ws["b3"], ws["sw3"], s_prev,
                w4=ws.get("w4"), b4=ws.get("b4"), sw4=ws.get("sw4"),
            )
            s_prev = blk.s_relu
        t0 = time.perf_counter()
        xp = jax.device_put(np.asarray(pack_activations(x, H, W)))
        y = qblock_chain(xp, *args_dev, blocks=blocks, H=H, W=W)
        got = np.asarray(unpack_activations(y, N, H, W))
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        print(
            f"[{name}] compile+check {time.perf_counter()-t0:.1f}s  "
            f"max|diff|={diff.max()}  frac>0={float((diff > 0).mean()):.5f}",
            flush=True,
        )

        # throughput at batch 128
        NB = 128
        if NB % (2 * g):
            NB = ((NB + 2 * g - 1) // (2 * g)) * 2 * g
        xb = rng.integers(-127, 128, (NB // g, H * g * seg, c0)).astype(np.int8)
        xb = jax.device_put(xb)
        fn = lambda: qblock_chain(xb, *args_dev, blocks=blocks, H=H, W=W)
        _sync(fn())
        t1 = min(_timed(fn, 1) for _ in range(3))
        tn = min(_timed(fn, 21) for _ in range(3))
        ms = (tn - t1) / 20 * 1e3
        if ms <= 0:
            ms = tn / 21 * 1e3
        gmacs = sum(
            NB * H * W * (
                b.c_in * b.c_mid + 9 * b.c_mid * b.c_mid + b.c_mid * b.c_out
                + (b.c_in * b.c_out if b.proj else 0)
            ) for b in blocks
        ) / 1e9
        tops = 2 * gmacs / (ms / 1e3) / 1e3
        print(
            f"[{name}] batch {NB}: {ms:.3f} ms/iter  "
            f"{NB/(ms/1e3):.0f} img/s  {tops:.1f} TOP/s "
            f"({tops/350*100:.0f}% of int8 peak)",
            flush=True,
        )


def _sync(out):
    # block_until_ready does not actually wait on this platform (tunnel);
    # fetching a scalar does
    return int(np.asarray(out[0, 0, 0]))


def _timed(fn, k):
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn()
    _sync(out)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
