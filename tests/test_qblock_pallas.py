"""qblock_chain Pallas kernel — fused ResNet bottleneck chains.

Oracle: a numpy per-block simulation with the engine's exact quantized
semantics (int32 accumulate, f32 per-channel requant fold, round-half-away,
clip, dequant-add-requant residual) — the same numeric chain as
ops/quantized.py::_requant_conv_out and the reference C engine's int8 kernels
(conv_kernel_ref_int8.c). Runs in pallas interpret mode on CPU.
"""

import numpy as np
import pytest

from tengine_tpu.ops.pallas.qblock import (
    QBlock,
    build_block_args,
    pack_activations,
    qblock_chain,
    seg_geometry,
    unpack_activations,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def round_away(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def conv_int(x, w, stride=1, pad=0):
    """Plain int32 NHWC direct conv, OIHW int8 weights."""
    N, H, W, C = x.shape
    O, _, kh, kw = w.shape
    xp = np.pad(x.astype(np.int32), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    OH = (H + 2 * pad - kh) // stride + 1
    OW = (W + 2 * pad - kw) // stride + 1
    out = np.zeros((N, OH, OW, O), np.int64)
    for oy in range(OH):
        for ox in range(OW):
            patch = xp[:, oy * stride : oy * stride + kh,
                       ox * stride : ox * stride + kw, :]
            out[:, oy, ox, :] = np.einsum(
                "nijc,ocij->no", patch, w.astype(np.int64)
            )
    return out


def requant_np(acc, m, b, act, s_out):
    q = acc.astype(np.float32) * m + b
    if act >= 0:
        q = np.maximum(q, 0.0)
        if act > 0:
            q = np.minimum(q, act / s_out)
    return np.clip(round_away(q), -127, 127).astype(np.int8)


def ref_block(x, blk, w1, b1, sw1, w2, b2, sw2, w3, b3, sw3, s_in,
              w4=None, b4=None, sw4=None):
    def mvec(s_prev, sw, s_out, bias, o):
        m = (s_prev * np.asarray(sw, np.float32).reshape(-1) / s_out).astype(
            np.float32
        )
        b0 = np.zeros(o, np.int64) if bias is None else bias.astype(np.int64)
        return m, (b0.astype(np.float64) * m).astype(np.float32)

    m1, bv1 = mvec(s_in, sw1, blk.s1, b1, w1.shape[0])
    q1 = requant_np(conv_int(x, w1), m1, bv1, blk.act1, blk.s1)
    m2, bv2 = mvec(blk.s1, sw2, blk.s2, b2, w2.shape[0])
    q2 = requant_np(conv_int(q1, w2, pad=1), m2, bv2, blk.act2, blk.s2)
    m3, bv3 = mvec(blk.s2, sw3, blk.s_mid, b3, w3.shape[0])
    t = requant_np(conv_int(q2, w3), m3, bv3, -1, blk.s_mid)
    if blk.proj:
        m4, bv4 = mvec(s_in, sw4, blk.s_r, b4, w4.shape[0])
        r = requant_np(conv_int(x, w4), m4, bv4, -1, blk.s_r)
    else:
        r = x
    y = round_away(
        (t.astype(np.float32) * blk.s_mid + r.astype(np.float32) * blk.s_r)
        / blk.s_out
    )
    y = np.clip(y, -127, 127)
    if blk.s_relu is not None:
        y = round_away(np.maximum(y, 0.0).astype(np.float32) * np.float32(blk.s_out) / np.float32(blk.s_relu))
        y = np.clip(y, -127, 127)
    return y.astype(np.int8)


def make_block(rng, c_in, c_mid, c_out, proj, s_in, bias=True,
               relu_rescale=False):
    s_out = float(rng.uniform(0.01, 0.03))
    blk = QBlock(
        c_in=c_in, c_mid=c_mid, c_out=c_out,
        act1=0, act2=0,
        s1=float(rng.uniform(0.01, 0.03)),
        s2=float(rng.uniform(0.01, 0.03)),
        s_mid=float(rng.uniform(0.01, 0.03)),
        s_r=float(rng.uniform(0.01, 0.03)) if proj else s_in,
        s_out=s_out,
        s_relu=float(rng.uniform(0.01, 0.03)) if relu_rescale else s_out,
        proj=proj,
    )
    def w(o, c, k):
        return rng.integers(-127, 128, (o, c, k, k)).astype(np.int8)

    def b(o):
        return rng.integers(-800, 800, o).astype(np.int32) if bias else None

    def sw(o):
        return rng.uniform(0.004, 0.02, o).astype(np.float32)

    ws = dict(
        w1=w(c_mid, c_in, 1), b1=b(c_mid), sw1=sw(c_mid),
        w2=w(c_mid, c_mid, 3), b2=b(c_mid), sw2=sw(c_mid),
        w3=w(c_out, c_mid, 1), b3=b(c_out), sw3=sw(c_out),
    )
    if proj:
        ws.update(w4=w(c_out, c_in, 1), b4=b(c_out), sw4=sw(c_out))
    return blk, ws


def run_chain_case(rng, N, H, W, c0, c_mid, c_out, nblocks, first_proj,
                   bias=True, relu_rescale=False):
    _, g = seg_geometry(W)
    N = 2 * g  # two packs -> two grid steps (exercises the DMA pipeline)
    s_in = 0.02
    x = rng.integers(-127, 128, (N, H, W, c0)).astype(np.int8)

    blocks, all_ws, all_args = [], [], []
    s_prev = s_in
    cin = c0
    for i in range(nblocks):
        proj = first_proj and i == 0
        blk, ws = make_block(rng, cin, c_mid, c_out, proj, s_prev, bias=bias,
                             relu_rescale=relu_rescale)
        blocks.append(blk)
        all_ws.append(ws)
        all_args += build_block_args(
            blk, ws["w1"], ws["b1"], ws["w2"], ws["b2"], ws["w3"], ws["b3"],
            s_prev, ws["sw1"], ws["sw2"], ws["sw3"],
            w4=ws.get("w4"), b4_q=ws.get("b4"), sw4=ws.get("sw4"),
        )
        s_prev = blk.s_relu
        cin = c_out

    # oracle
    ref = x
    s_prev = s_in
    for blk, ws in zip(blocks, all_ws):
        ref = ref_block(
            ref, blk, ws["w1"], ws["b1"], ws["sw1"], ws["w2"], ws["b2"],
            ws["sw2"], ws["w3"], ws["b3"], ws["sw3"], s_prev,
            w4=ws.get("w4"), b4=ws.get("b4"), sw4=ws.get("sw4"),
        )
        s_prev = blk.s_relu

    xp = pack_activations(x, H, W)
    y = qblock_chain(xp, *all_args, blocks=tuple(blocks), H=H, W=W)
    got = np.asarray(unpack_activations(y, N, H, W))
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()} (>{(diff > 1).mean():.4f})"
    # round-half-away ties are the only permissible difference
    assert (diff > 0).mean() < 0.01


def test_pack_roundtrip(rng):
    for H, W, C in ((8, 8, 16), (6, 14, 8), (4, 28, 4), (5, 7, 8)):
        seg, g = seg_geometry(W)
        N = 2 * g
        x = rng.integers(-127, 128, (N, H, W, C)).astype(np.int8)
        xp = pack_activations(x, H, W)
        assert xp.shape == (N // g, H * g * seg, C)
        assert (H * g * seg) % 32 == 0
        back = np.asarray(unpack_activations(xp, N, H, W))
        np.testing.assert_array_equal(back, x)


def test_single_identity_block(rng):
    run_chain_case(rng, N=2, H=6, W=6, c0=16, c_mid=8, c_out=16,
                   nblocks=1, first_proj=False)


def test_chain_of_three(rng):
    run_chain_case(rng, N=2, H=5, W=7, c0=16, c_mid=8, c_out=16,
                   nblocks=3, first_proj=False)


def test_proj_block_chain(rng):
    # block0 projection (stride-1, stage1-style): c_in != c_out
    run_chain_case(rng, N=4, H=6, W=14, c0=8, c_mid=8, c_out=16,
                   nblocks=2, first_proj=True)


def test_no_bias(rng):
    run_chain_case(rng, N=2, H=6, W=6, c0=8, c_mid=8, c_out=8,
                   nblocks=1, first_proj=False, bias=False)


def test_packed_small_w(rng):
    # W=7 -> SEG=8, g=4: four images packed per row block
    run_chain_case(rng, N=8, H=7, W=7, c0=8, c_mid=8, c_out=8,
                   nblocks=2, first_proj=False)


def test_relu_rescale_chain(rng):
    # trailing ReLu with its own quant scale (the real quantizer assigns
    # relu-out stats independently): second rounding must match
    run_chain_case(rng, N=2, H=6, W=6, c0=16, c_mid=8, c_out=16,
                   nblocks=2, first_proj=False, relu_rescale=True)
