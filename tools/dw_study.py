#!/usr/bin/env python
"""Standalone depthwise-conv variant study on the real chip (VERDICT r4
item 1 groundwork): measures, per mobilenet-family dw geometry, every
storage/compute variant against the byte roofline, to pick the s8 dw bet.

Variants:
  bf16        : bf16 in -> bf16 dw conv (f32 acc) -> requant -> bf16 out
                (the legacy-path inner op, 2 B/elt both sides)
  s8_direct   : s8 in -> s8 dw conv (s32 acc) -> requant -> s8 out
                (XLA's s8 dw window emitters — the measured "3-10x off")
  s8_via_bf16 : s8 in -> astype(bf16) fused into the window read -> bf16 dw
                -> requant -> s8 out (k^2-recomputed convert, 1 B/elt HBM)
  s8_bar      : same but the convert materializes (optimization_barrier)
                before the window read (extra 2 B/elt round trip)
  pallas      : ops/pallas/dw_conv.py s8 kernel (when present)

Usage: python tools/dw_study.py [variant ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

# mobilenet-v1 dw geometries at b128: (H, C, stride)
GEOMS = [
    (112, 64, 1),
    (112, 64, 2),  # v1 actually has 112x64 s2? (layers: 112/32 s1? see zoo)
    (112, 32, 1),
    (56, 128, 1),
    (56, 128, 2),
    (28, 256, 1),
    (28, 256, 2),
    (14, 512, 1),
    (14, 512, 2),
    (7, 1024, 1),
]
N = 128
K = 3
HBM_GBPS = 819.0


def requant(acc, M, B, out_dtype, lo, hi):
    q = acc.astype(jnp.float32) * M + B
    q = jnp.clip(lax.round(q, lax.RoundingMethod.AWAY_FROM_ZERO), lo, hi)
    return q


def dw_bf16(x, w, M, B):
    acc = lax.conv_general_dilated(
        x, w, window_strides=(ST, ST), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    )
    return requant(acc, M, B, jnp.bfloat16, -127, 127).astype(jnp.bfloat16)


def dw_s8_direct(x, w, M, B):
    acc = lax.conv_general_dilated(
        x, w, window_strides=(ST, ST), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.int32,
    )
    return requant(acc, M, B, jnp.int8, -127, 127).astype(jnp.int8)


def dw_s8_via_bf16(x, w, M, B, barrier=False):
    xb = x.astype(jnp.bfloat16)
    if barrier:
        xb = lax.optimization_barrier(xb)
    acc = lax.conv_general_dilated(
        xb, w, window_strides=(ST, ST), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    )
    return requant(acc, M, B, jnp.int8, -127, 127).astype(jnp.int8)


def dw_s8_wfold(x, w, M, B):
    """MEASURED-NEGATIVE probe, kept as the record (r5): dw s2 with W
    folded into channels — XLA's grouped-conv emitter with 2 channels per
    group runs 9x slower than the direct s8 dw (112²x64: 1.94 vs 0.21 ms),
    which killed the idea before the tap-mapping was even debugged (the
    variant also fails the bit-equality probe; do NOT use it for
    numerics)."""
    N_, H, W, C = map(int, x.shape)
    pad_l = 1
    xf = x.reshape(N_, H, W // 2, 2 * C)
    # folded weights: [kh, kw_f, 2, C]; tap b -> (col (b-1)//2 +1? see map)
    wf = np.zeros((K, 2, 2, C), np.int8)
    w_ = np.asarray(w).reshape(K, K, C)  # [kh, kw, C]
    for b in range(K):
        col = (b - 1) // 2 + 1  # pad_l=1 shifts col index up by 1
        phase = (b - 1) % 2
        wf[:, col, phase, :] = w_[:, b, :]
    acc = lax.conv_general_dilated(
        xf, jnp.asarray(wf),
        window_strides=(2, 1),
        padding=((1, 1), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=jnp.int32,
    )
    return requant(acc, M, B, jnp.int8, -127, 127).astype(jnp.int8)


def time_op(fn, x):
    """Per-op device ms via the pipelined-dispatch slope method (bench.py:
    measure_device_ms — the tunnel RTT makes naive wall timing useless)."""
    from bench import measure_device_ms

    jf = jax.jit(fn)
    return measure_device_ms(
        lambda: jf(x), lambda out: out.block_until_ready()
    )


def main():
    global ST
    want = sys.argv[1:] or ["bf16", "s8_direct", "s8_via_bf16", "s8_bar",
                            "pallas"]
    rng = np.random.default_rng(0)
    print(f"{'geom':>16} {'variant':>12} {'ms':>8} {'GB/s':>7} {'%roof':>6}")
    for H, C, s in GEOMS:
        ST = s
        OH = H // s
        x8 = jnp.asarray(
            rng.integers(-127, 128, (N, H, H, C)).astype(np.int8)
        )
        xb = x8.astype(jnp.bfloat16)
        wf = rng.standard_normal((K, K, 1, C)).astype(np.float32)
        w8 = jnp.asarray(np.clip(np.round(wf * 30), -127, 127).astype(np.int8))
        wb = jnp.asarray(wf.astype(jnp.bfloat16))
        M = jnp.asarray(np.full(C, 0.003, np.float32))
        B = jnp.asarray(np.zeros(C, np.float32))

        variants = {}
        if "bf16" in want:
            variants["bf16"] = (
                functools.partial(dw_bf16, w=wb, M=M, B=B), xb, 2, 2
            )
        if "s8_direct" in want:
            variants["s8_direct"] = (
                functools.partial(dw_s8_direct, w=w8, M=M, B=B), x8, 1, 1
            )
        if "s8_via_bf16" in want:
            variants["s8_via_bf16"] = (
                functools.partial(dw_s8_via_bf16, w=wb, M=M, B=B), x8, 1, 1
            )
        if "s8_bar" in want:
            variants["s8_bar"] = (
                functools.partial(dw_s8_via_bf16, w=wb, M=M, B=B,
                                  barrier=True), x8, 1, 1,
            )
        if "s8_fold" in want and s == 2:
            variants["s8_fold"] = (
                functools.partial(dw_s8_wfold, w=w8, M=M, B=B), x8, 1, 1
            )
        if "pallas" in want:
            try:
                from tengine_tpu.ops.pallas.dw_conv import dw_qconv

                variants["pallas"] = (
                    functools.partial(
                        dw_qconv, w=w8, M=M, B=B, stride=s, pad=1,
                        zp_in=0, lo=-127.0, hi=127.0, act=-1,
                    ),
                    x8, 1, 1,
                )
            except ImportError:
                pass
        if "pallas_floor" in want and s == 1:
            # 1-tap variant of the same kernel: DMA + convert + epilogue +
            # store floor, no window FMAs
            from tengine_tpu.ops.pallas.dw_conv import dw_qconv_hwcn

            x_hwcn1 = jnp.asarray(
                np.ascontiguousarray(np.asarray(x8).transpose(1, 2, 3, 0))
            )
            w1 = jnp.asarray(np.ones((1, C), np.float32))
            variants["pallas_floor"] = (
                functools.partial(
                    dw_qconv_hwcn, w=w1, M=M, B=B, k=1, stride=1, pad=0,
                    zp_in=0, lo=-127.0, hi=127.0, act=-1,
                ),
                x_hwcn1, 1, 1,
            )
        if "pallas_hwcn" in want:
            # kernel-native layout: batch already in lanes (what the
            # in-graph boundary gives when producers are batch-minor)
            from tengine_tpu.ops.pallas.dw_conv import dw_qconv_hwcn

            x_hwcn = jnp.asarray(
                np.ascontiguousarray(np.asarray(x8).transpose(1, 2, 3, 0))
            )
            wflat = jnp.asarray(
                np.asarray(w8).reshape(K * K, C).astype(np.float32)
            )
            variants["pallas_hwcn"] = (
                functools.partial(
                    dw_qconv_hwcn, w=wflat, M=M, B=B, k=K, stride=s, pad=1,
                    zp_in=0, lo=-127.0, hi=127.0, act=-1,
                ),
                x_hwcn, 1, 1,
            )

        for name, (fn, xin, bin_, bout) in variants.items():
            try:
                ms = time_op(fn, xin)
            except Exception as e:
                print(f"{H}x{H}x{C}s{s:>2} {name:>12}  FAIL {type(e).__name__}: {e}"[:110])
                continue
            gb = (N * H * H * C * bin_ + N * OH * OH * C * bout) / 1e9
            gbps = gb / (ms / 1e3)
            print(
                f"{H}x{H}x{C}s{s:>4} {name:>12} {ms:8.3f} {gbps:7.0f} "
                f"{100*gbps/HBM_GBPS:5.0f}%"
            )


if __name__ == "__main__":
    main()
