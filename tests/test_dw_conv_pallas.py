"""ops/pallas/dw_conv.py — the s8 depthwise kernel (VERDICT r5 item 1).

Oracle: the same requant math on a lax depthwise conv (the engine's exact
integer path). The kernel must be bit-equal — it does the identical integer
accumulation (f32 FMA of ints < 2^24 is exact) and the identical epilogue.
Covers stride 1/2, k 3/5, C below/above the 128 sublane chunk, zero and
nonzero input zero-points (native-shifted grids), relu/relu6, uint8 out.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax import lax

from tengine_tpu.ops.pallas.dw_conv import dw_qconv


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def ref_dw(x, w_oihw, M, B, *, stride, pad, zp_in, zp_out, act, s_out,
           lo, hi, out_u8):
    """Reference: raw-value conv with zp-padded borders + folded zp
    correction in B (the engine's dw_zp_fold scheme) -> requant."""
    C = x.shape[-1]
    k = w_oihw.shape[-1]
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0)).astype(np.float32)  # k,k,1,C
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
        constant_values=float(zp_in),
    )
    acc = lax.conv_general_dilated(
        xp, jnp.asarray(w_hwio),
        window_strides=(stride, stride), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C, preferred_element_type=jnp.float32,
    )
    q = acc * M + B
    if act >= 0:
        if act == 1:
            q = jnp.clip(q, -1.0 / s_out, 1.0 / s_out)
        else:
            q = jnp.maximum(q, 0.0)
            if act > 0:
                q = jnp.minimum(q, float(act) / s_out)
    q = jnp.clip(
        lax.round(q, lax.RoundingMethod.AWAY_FROM_ZERO) + zp_out, lo, hi
    )
    return np.asarray(q.astype(jnp.uint8 if out_u8 else jnp.int8))


CASES = [
    # (N, H, C, k, stride, pad, zp_in, zp_out, act, u8)
    (4, 16, 32, 3, 1, 1, 0, 0, -1, False),
    (4, 16, 32, 3, 2, 1, 0, 0, -1, False),
    (4, 16, 256, 3, 1, 1, 0, 3, 0, False),     # C chunking + relu
    (4, 16, 256, 3, 2, 1, -7, 5, -1, False),   # shifted-s8 zp + stride 2
    (4, 16, 32, 3, 1, 1, -12, -3, 6, False),   # zp + relu6
    (4, 16, 32, 5, 1, 2, 0, 0, -1, False),     # k5 (mobilenet-v3)
    (4, 16, 32, 5, 2, 2, -4, 2, -1, False),    # k5 stride 2 (delta > 0)
    (4, 16, 32, 3, 1, 1, 128, 128, 0, True),   # uint8 in/out (legacy grid)
    (4, 14, 64, 3, 1, 1, 0, 0, -1, False),     # odd-ish H (14 = R band)
    (4, 14, 64, 3, 2, 1, 0, 0, -1, False),     # OH = 7
]


@pytest.mark.parametrize("N,H,C,k,s,pad,zp_in,zp_out,act,u8", CASES)
def test_dw_qconv_bit_equal(rng, N, H, C, k, s, pad, zp_in, zp_out, act, u8):
    W = H
    if u8:
        x = rng.integers(0, 256, (N, H, W, C)).astype(np.uint8)
    else:
        x = rng.integers(-128, 128, (N, H, W, C)).astype(np.int8)
    w = rng.integers(-100, 101, (C, 1, k, k)).astype(np.int32)
    M = (rng.uniform(0.001, 0.01, C)).astype(np.float32)
    s_out = 0.05
    # true-value weights: B carries -zp_in * colsum(w) * M (dw_zp_fold)
    colsum = w.reshape(C, -1).sum(axis=1)
    bias = rng.integers(-1000, 1000, C).astype(np.float64)
    B = ((bias - zp_in * colsum) * M.astype(np.float64)).astype(np.float32)
    lo, hi = (0, 255) if u8 else (-128, 127)

    y = np.asarray(
        jax.jit(
            lambda xx: dw_qconv(
                xx, w, jnp.asarray(M), jnp.asarray(B),
                stride=s, pad=pad, zp_in=zp_in, zp_out=zp_out, act=act,
                s_out=s_out, lo=float(lo), hi=float(hi), out_u8=u8,
            )
        )(x)
    )
    # reference gets the same folded-B convention
    yr = ref_dw(
        x, w, M, B, stride=s, pad=pad, zp_in=zp_in, zp_out=zp_out,
        act=act, s_out=s_out, lo=lo, hi=hi, out_u8=u8,
    )
    np.testing.assert_array_equal(y, yr)


def test_dw_qconv_tf_style_pads(rng):
    """TF-converted tmfile stride-2 layers pad (0,1),(0,1) — asymmetric."""
    import jax.numpy as jnp
    from jax import lax

    N, H, C, k, s = 4, 16, 32, 3, 2
    x = rng.integers(-128, 128, (N, H, H, C)).astype(np.int8)
    w = rng.integers(-100, 101, (C, 1, k, k)).astype(np.int32)
    M = (rng.uniform(0.001, 0.01, C)).astype(np.float32)
    B = np.zeros(C, np.float32)

    y = np.asarray(
        jax.jit(
            lambda xx: dw_qconv(
                xx, w, jnp.asarray(M), jnp.asarray(B),
                stride=s, pad=0, pad_l=0, pad_b=1, pad_r=1,
                lo=-128.0, hi=127.0,
            )
        )(x)
    )
    w_hwio = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 1), (0, 1), (0, 0)))
    acc = lax.conv_general_dilated(
        xp, jnp.asarray(w_hwio), window_strides=(s, s),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C, preferred_element_type=jnp.float32,
    )
    q = jnp.clip(
        lax.round(acc * M + B, lax.RoundingMethod.AWAY_FROM_ZERO),
        -128, 127,
    )
    np.testing.assert_array_equal(y, np.asarray(q.astype(jnp.int8)))
