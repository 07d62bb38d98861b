"""qconv_direct / qconv1x1 Pallas kernels + fuse_conv_add pass.

Oracle: a numpy direct conv with the reference's quantized semantics
(zero-point shifted int math, fp64 requant fold, round-half-away, clip) —
the same numeric class the C engine's ref kernels implement
(conv_kernel_ref_uint8.c:67-177). Runs in pallas interpret mode on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tengine_tpu.ops.pallas.qconv import pack_qconv_weights, qconv1x1, qconv_direct


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def ref_conv(x, w, bias, kh, kw, s, pad, zp_in, zp_w, s_in, s_w, s_out, zp_out, act, u8):
    N, H, W, C = x.shape
    O = w.shape[0]
    xp = np.pad(
        x.astype(np.int32), ((0, 0), (pad, pad), (pad, pad), (0, 0)),
        constant_values=zp_in,
    )
    OH = (H + 2 * pad - kh) // s + 1
    OW = (W + 2 * pad - kw) // s + 1
    out = np.zeros((N, OH, OW, O), np.float32)
    xs = xp - zp_in
    ws = w.astype(np.int32) - zp_w
    for oy in range(OH):
        for ox in range(OW):
            patch = xs[:, oy * s : oy * s + kh, ox * s : ox * s + kw, :]
            out[:, oy, ox, :] = np.einsum("nijc,ocij->no", patch, ws)
    sw = s_w if np.ndim(s_w) else np.full(O, s_w)
    q = out * (s_in * sw / s_out) + bias * s_in * sw / s_out + zp_out
    if act >= 0:
        q = np.maximum(q, zp_out)
        if act > 0:
            q = np.minimum(q, act / s_out + zp_out)
    lo, hi = (0, 255) if u8 else (-127, 127)
    r = np.sign(q) * np.floor(np.abs(q) + 0.5)
    return np.clip(r, lo, hi).astype(np.uint8 if u8 else np.int8)


def run_case(rng, N, H, C, O, kh, s, pad, u8, per_channel, act, ones_col):
    kw = kh
    if u8:
        x = rng.integers(0, 256, (N, H, H, C)).astype(np.uint8)
        w = rng.integers(0, 256, (O, C, kh, kw)).astype(np.uint8)
        zp_in, zp_w, s_w = 7, 131, 0.01
    else:
        x = rng.integers(-127, 128, (N, H, H, C)).astype(np.int8)
        w = rng.integers(-127, 128, (O, C, kh, kw)).astype(np.int8)
        zp_in, zp_w = 0, 0
        s_w = rng.uniform(0.005, 0.02, O).astype(np.float32) if per_channel else 0.01
    s_in, s_out = 0.02, 0.05
    bias = rng.integers(-1000, 1000, O).astype(np.int32)
    zp_out = 9 if u8 else 0

    golden = ref_conv(
        x, w, bias, kh, kw, s, pad, zp_in, zp_w, s_in, s_w, s_out, zp_out, act, u8
    )

    wk = pack_qconv_weights(w, u8, ones_col and u8)
    sw = s_w if np.ndim(s_w) else np.full(O, s_w, np.float32)
    M = (s_in * sw / s_out).astype(np.float32)
    if u8:
        cx, cw = 128 - zp_in, 128 - zp_w
        colsum = (w.astype(np.int32) - 128).sum(axis=(1, 2, 3))
        b0 = cx * colsum + C * kh * kw * cx * cw + bias
    else:
        cw, b0 = 0, bias
    B = (b0.astype(np.float64) * M + zp_out).astype(np.float32)
    kw_args = dict(
        cw=cw, act=act, inv_s_out=1 / s_out, zp_out=zp_out,
        lo=0 if u8 else -127, hi=255 if u8 else 127,
        out_dtype="uint8" if u8 else "int8",
    )
    if kh == 1 and s == 1 and pad == 0:
        out = qconv1x1(
            jnp.asarray(x).reshape(N * H * H, C), jnp.asarray(wk),
            jnp.asarray(M), jnp.asarray(B), **kw_args,
        )
        out = np.asarray(out).reshape(N, H, H, O)
    else:
        out = np.asarray(
            qconv_direct(
                jnp.asarray(x), jnp.asarray(wk), jnp.asarray(M), jnp.asarray(B),
                kh=kh, kw=kw, stride=s,
                pad_t=pad, pad_b=pad, pad_l=pad, pad_r=pad,
                zp_in=zp_in, **kw_args,
            )
        )
    diff = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"


CASES = [
    # N, H, C, O, k, s, pad, u8, per_channel, act, ones_col
    (2, 12, 128, 32, 3, 1, 1, True, False, 0, True),
    (2, 12, 128, 32, 3, 1, 1, True, False, 0, False),
    (2, 12, 128, 32, 3, 2, 1, True, False, -1, True),
    (2, 12, 128, 32, 1, 1, 0, True, False, 0, False),
    (2, 12, 128, 32, 3, 1, 1, False, True, 0, False),
    (2, 12, 128, 32, 3, 2, 1, False, True, -1, False),
    (2, 14, 128, 24, 5, 1, 2, False, True, 0, False),
    (1, 12, 256, 32, 1, 1, 0, False, True, -1, False),
    (4, 12, 128, 130, 3, 1, 1, True, False, 0, True),
    (2, 12, 64, 48, 1, 1, 0, True, False, 0, False),  # gemm mode, C<128
]


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_qconv_vs_ref(rng, case):
    run_case(rng, *case)


def _tiny_resnet_block(rng, c=128):
    """input -> conv3x3(relu) -> conv1x1 -> add(skip) -> relu."""
    from tengine_tpu.graph.ir import DType, Graph, TensorType
    from tengine_tpu.serializer.tm2 import format as tmfmt

    g = Graph()
    x = g.add_tensor("x", DType.FP32, [1, c, 8, 8], TensorType.INPUT)
    inp = g.add_node("InputOp", "input", [], [x.idx])

    def conv(name, cur, cin, cout, k, act):
        w = g.add_tensor(
            f"{name}_w", DType.FP32, [cout, cin, k, k], TensorType.CONST,
            data=(rng.standard_normal((cout, cin, k, k)) * 0.2).astype(np.float32),
        )
        b = g.add_tensor(
            f"{name}_b", DType.FP32, [cout], TensorType.CONST,
            data=(rng.standard_normal(cout) * 0.1).astype(np.float32),
        )
        out = g.add_tensor(f"{name}_out", DType.FP32, [], TensorType.VAR)
        g.add_node(
            "Convolution", name, [cur, w.idx, b.idx], [out.idx],
            params=dict(
                kernel_h=k, kernel_w=k, stride_h=1, stride_w=1,
                dilation_h=1, dilation_w=1, group=1, activation=act,
                pad_h0=k // 2, pad_w0=k // 2, pad_h1=k // 2, pad_w1=k // 2,
                input_channel=cin, output_channel=cout,
            ),
        )
        return out.idx

    c1 = conv("conv1", x.idx, c, c, 3, 0)
    c2 = conv("conv2", c1, c, c, 1, -1)
    added = g.add_tensor("added", DType.FP32, [], TensorType.VAR)
    g.add_node(
        "Eltwise", "add", [c2, x.idx], [added.idx],
        params=dict(type=tmfmt.ELT_SUM, caffe_flavor=0, shift=0.0, power=1.0, scale=1.0),
    )
    relu_out = g.add_tensor("relu_out", DType.FP32, [], TensorType.VAR)
    g.add_node("ReLu", "relu", [added.idx], [relu_out.idx], params=dict(negative_slope=0.0))
    g.inputs = [inp.idx]
    g.outputs = [g.nodes[-1].idx]
    return g


@pytest.mark.parametrize("scheme", ["uint8", "int8"])
def test_fuse_conv_add_end_to_end(rng, scheme):
    """fuse_conv_add folds the residual add (+relu) into the pallas conv and
    matches the unfused int-storage fast path bit-for-bit."""
    from tengine_tpu.executor.engine import compile_graph
    from tengine_tpu.ops import qmath
    from tengine_tpu.quantize.quantizer import quantize_graph
    from tengine_tpu.utils.config import Options

    g = _tiny_resnet_block(rng)
    calib = [rng.standard_normal((1, 128, 8, 8)).astype(np.float32) for _ in range(3)]
    qg = quantize_graph(g, calib, scheme=scheme)
    t_in = qg.tensors[qg.input_tensors[0]]
    xq = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)

    # exact-tier comparison: pin the oracle engines (quant_relaxed defaults on)
    base = dict(quant_mode="fast", quant_bf16_storage=False, quant_relaxed=False)
    (unfused,) = compile_graph(qg, Options(pallas_qconv=False, **base)).run(xq)
    cg = compile_graph(qg, Options(pallas_qconv=True, **base))
    assert any("fused_add_pos" in n.params for n in cg.graph.nodes)
    (fused,) = cg.run(xq)
    diff = np.abs(fused.astype(np.int32) - unfused.astype(np.int32))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"


class TestStemConv:
    """Fused stem kernel (ops/pallas/stem_conv.py) vs the bf16 XLA fast
    path — exact for s8/u8 inputs, u8 weights, every activation code."""

    @pytest.mark.parametrize(
        "k,pad,act,mode,zp_w",
        [(6, 2, 100, "s8", 0), (3, 1, 0, "u8", 0), (7, 3, -1, "s8", 0),
         (6, 2, 6, "u8", 113)],
    )
    def test_stem_qconv_exact(self, k, pad, act, mode, zp_w, rng):
        import jax
        import jax.numpy as jnp

        from tengine_tpu.ops.pallas.stem_conv import stem_qconv

        B, C, H, W, Cout = 2, 3, 32, 32, 32
        if mode == "s8":
            x = rng.integers(-127, 128, (B, C, H, W)).astype(np.int8)
            zp_in = zp_out = 0
            lo, hi = -127, 127
            w = rng.integers(-127, 128, (Cout, C, k, k)).astype(np.float32)
        else:
            x = rng.integers(0, 256, (B, C, H, W)).astype(np.uint8)
            zp_in, zp_out, lo, hi = 117, 121, 0, 255
            w = rng.integers(0 if zp_w else -127, 128 + (128 if zp_w else 0),
                             (Cout, C, k, k)).astype(np.float32)
        mult = rng.random(Cout).astype(np.float32) * 1e-3 + 1e-4
        bias = rng.standard_normal(Cout).astype(np.float32)
        s_out = 0.05

        got = np.asarray(stem_qconv(
            jnp.asarray(x), w, mult, bias, k=k, pad=pad, act=act, s_out=s_out,
            zp_in=zp_in, zp_w=zp_w, zp_out=zp_out, lo=lo, hi=hi, out_f32=True,
        ))

        xs = jnp.asarray(x.astype(np.float32) - zp_in).astype(jnp.bfloat16)
        xs = jnp.transpose(xs, (0, 2, 3, 1))
        wm = jnp.asarray(w - zp_w).transpose(2, 3, 1, 0).astype(jnp.bfloat16)
        acc = jax.lax.conv_general_dilated(
            xs, wm, (2, 2), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        q = acc * jnp.asarray(mult) + jnp.asarray(bias)
        if act == 100:
            q = q * jax.nn.sigmoid(q * s_out)
        elif act == 0:
            q = jnp.maximum(q, 0.0)
        elif act == 6:
            q = jnp.minimum(jnp.maximum(q, 0.0), 6.0 / s_out)
        q = jnp.sign(q) * jnp.floor(jnp.abs(q) + 0.5) + zp_out
        exp = np.asarray(jnp.clip(q, lo, hi))
        np.testing.assert_array_equal(got, exp)
