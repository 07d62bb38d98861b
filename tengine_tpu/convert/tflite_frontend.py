"""TFLite front-end: .tflite flatbuffer -> IR Graph, quant params included.

Reference: tools/convert_tool/tf_lite/ (flatbuffer importer, the largest of
the reference's 7 front-ends). Parsing uses the flatbuffer schema bundled
with tensorflow (tensorflow.lite.python.schema_py_generated) — no schema
compilation step.

TFLite is the quantization-native interchange format: per-tensor uint8
asymmetric and per-channel int8 tensors carry (scale, zero_point) exactly
like tmfile quant params, so quantized .tflite models import straight onto
the quantized execution engine (quant params land in Tensor.quant; conv
weights are dequantize-free).

Layouts: TFLite activations are NHWC and conv weights OHWI / depthwise
1HWC(M); the importer transposes to the IR's NCHW / OIHW convention like the
TF front-end.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..graph.ir import DType, Graph, QuantParam, TensorType
from ..serializer.tm2.format import ELT_PROD, ELT_SUM

_DT = {0: DType.FP32, 2: DType.INT32, 3: DType.UINT8, 9: DType.INT8, 7: DType.INT16}

# fused_activation_function enum -> IR conv activation code
_ACT = {0: -1, 1: 0, 2: 1, 3: 6}  # NONE, RELU, RELU_N1_TO_1, RELU6


def _np_of(t_dtype: DType):
    return t_dtype.np


def from_tflite(path_or_bytes, input_shape: Optional[List[int]] = None) -> Graph:
    """Import a .tflite model (fp32 or quantized).

    Supported builtins: CONV_2D, DEPTHWISE_CONV_2D, FULLY_CONNECTED,
    MAX/AVERAGE_POOL_2D, ADD, MUL, CONCATENATION, RESHAPE, SOFTMAX, RELU,
    RELU6, LOGISTIC, MEAN(H,W), PAD, RESIZE_NEAREST_NEIGHBOR.
    """
    from tensorflow.lite.python import schema_py_generated as fb

    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    model = fb.Model.GetRootAsModel(buf, 0)
    sub = model.Subgraphs(0)

    g = Graph(name="tflite", source_format="tflite")
    tmap: Dict[int, int] = {}  # tflite tensor idx -> IR tensor idx

    def quant_of(t) -> Optional[QuantParam]:
        q = t.Quantization()
        if q is None or q.ScaleLength() == 0:
            return None
        scales = q.ScaleAsNumpy().astype(np.float32)
        zps = (
            q.ZeroPointAsNumpy().astype(np.int32)
            if q.ZeroPointLength()
            else np.zeros(len(scales), np.int32)
        )
        if len(scales) == 1:
            return QuantParam.per_tensor(float(scales[0]), int(zps[0]), width=8)
        return QuantParam(scales=scales, zero_points=zps, width=8)

    def tensor_data(i: int) -> Optional[np.ndarray]:
        t = sub.Tensors(i)
        b = model.Buffers(t.Buffer())
        if b.DataLength() == 0:
            return None
        arr = b.DataAsNumpy().view(_np_of(_DT[t.Type()]))
        shape = t.ShapeAsNumpy()
        return arr.reshape([int(d) for d in shape]) if len(shape) else arr

    def ir_tensor(i: int, transform=None, as_type=None, name_suffix="") -> int:
        """Materialize tflite tensor i into the IR (const or var)."""
        key = (i, name_suffix)
        if name_suffix == "" and i in tmap:
            return tmap[i]
        t = sub.Tensors(i)
        name = (t.Name() or b"").decode() + name_suffix
        dtype = _DT[t.Type()]
        data = tensor_data(i)
        quant = quant_of(t)
        if data is not None:
            if transform is not None:
                data = transform(data)
            tt = g.add_tensor(name, as_type or dtype, list(data.shape),
                              TensorType.CONST, data=np.ascontiguousarray(data),
                              quant=quant)
        else:
            tt = g.add_tensor(name, dtype, [], TensorType.VAR, quant=quant)
        if name_suffix == "":
            tmap[i] = tt.idx
        return tt.idx

    # graph inputs: NHWC -> NCHW shape
    sub_inputs = [sub.Inputs(i) for i in range(sub.InputsLength())]
    for i in sub_inputs:
        t = sub.Tensors(i)
        dims = [int(d) for d in t.ShapeAsNumpy()]
        if input_shape:
            shape = list(input_shape)
        elif len(dims) == 4:
            shape = [dims[0], dims[3], dims[1], dims[2]]
        else:
            shape = dims
        tt = g.add_tensor((t.Name() or b"in").decode(), _DT[t.Type()], shape,
                          TensorType.INPUT, quant=quant_of(t))
        n = g.add_node("InputOp", tt.name, [], [tt.idx])
        g.inputs.append(n.idx)
        tmap[i] = tt.idx

    def opname(op) -> int:
        oc = model.OperatorCodes(op.OpcodeIndex())
        code = oc.BuiltinCode()
        if code == 0 and hasattr(oc, "DeprecatedBuiltinCode"):
            code = max(code, oc.DeprecatedBuiltinCode())
        return code

    B = __import__("tensorflow.lite.python.schema_py_generated", fromlist=["x"]).BuiltinOperator

    def emit(op: str, name: str, ins: List[int], out_i: int, params: dict):
        out = ir_tensor(out_i)
        g.add_node(op, name or f"op{out_i}", ins, [out], params=params)
        return out

    for oi in range(sub.OperatorsLength()):
        op = sub.Operators(oi)
        code = opname(op)
        ins = [op.Inputs(i) for i in range(op.InputsLength())]
        out_i = op.Outputs(0)
        name = (sub.Tensors(out_i).Name() or b"").decode()

        if code in (B.CONV_2D, B.DEPTHWISE_CONV_2D):
            opts = fb.Conv2DOptions() if code == B.CONV_2D else fb.DepthwiseConv2DOptions()
            opts.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            wt = sub.Tensors(ins[1])
            wshape = [int(d) for d in wt.ShapeAsNumpy()]
            if code == B.CONV_2D:
                # OHWI -> OIHW
                tr = lambda a: np.ascontiguousarray(a.transpose(0, 3, 1, 2))
                O, kh, kw, I = wshape
                group = 1
            else:
                # [1, kh, kw, C*M] -> [C*M, 1, kh, kw]
                tr = lambda a: np.ascontiguousarray(
                    a.transpose(3, 0, 1, 2)
                )
                _, kh, kw, O = wshape
                I, group = 1, O // max(opts.DepthMultiplier(), 1)
            w_idx = ir_tensor(ins[1], transform=tr)
            node_ins = [ir_tensor(ins[0]), w_idx]
            if len(ins) > 2 and ins[2] >= 0:
                node_ins.append(ir_tensor(ins[2]))
            pv = -1 if opts.Padding() == 0 else 0  # SAME / VALID
            emit("Convolution", name, node_ins, out_i, dict(
                kernel_h=kh, kernel_w=kw,
                stride_h=opts.StrideH(), stride_w=opts.StrideW(),
                dilation_h=max(getattr(opts, "DilationHFactor", lambda: 1)(), 1),
                dilation_w=max(getattr(opts, "DilationWFactor", lambda: 1)(), 1),
                input_channel=I * group, output_channel=O, group=group,
                activation=_ACT.get(opts.FusedActivationFunction(), -1),
                pad_h0=pv, pad_h1=pv, pad_w0=pv, pad_w1=pv))
        elif code == B.FULLY_CONNECTED:
            opts = fb.FullyConnectedOptions()
            opts.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            w_idx = ir_tensor(ins[1])  # already [out, in]
            node_ins = [ir_tensor(ins[0]), w_idx]
            if len(ins) > 2 and ins[2] >= 0:
                node_ins.append(ir_tensor(ins[2]))
            out_c = int(sub.Tensors(ins[1]).ShapeAsNumpy()[0])
            act = _ACT.get(opts.FusedActivationFunction(), -1)
            o = emit("FullyConnected", name, node_ins, out_i, dict(num_output=out_c))
            if act >= 0:
                raise NotImplementedError("fused activation on FULLY_CONNECTED")
        elif code in (B.MAX_POOL_2D, B.AVERAGE_POOL_2D):
            opts = fb.Pool2DOptions()
            opts.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            pv = -1 if opts.Padding() == 0 else 0
            emit("Pooling", name, [ir_tensor(ins[0])], out_i, dict(
                alg=0 if code == B.MAX_POOL_2D else 1,
                kernel_h=opts.FilterHeight(), kernel_w=opts.FilterWidth(),
                stride_h=opts.StrideH(), stride_w=opts.StrideW(),
                global_pool=0, caffe_flavor=0,
                pad_h0=pv, pad_h1=pv, pad_w0=pv, pad_w1=pv))
        elif code in (B.ADD, B.MUL):
            emit("Eltwise", name, [ir_tensor(ins[0]), ir_tensor(ins[1])], out_i, dict(
                type=ELT_SUM if code == B.ADD else ELT_PROD,
                caffe_flavor=0, shift=0.0, power=1.0, scale=1.0))
        elif code == B.CONCATENATION:
            opts = fb.ConcatenationOptions()
            opts.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
            axis = int(opts.Axis())
            rank = len(sub.Tensors(ins[0]).ShapeAsNumpy())
            if rank == 4:
                axis = {0: 0, 1: 2, 2: 3, 3: 1, -1: 1}.get(axis, axis)
            emit("Concat", name, [ir_tensor(i) for i in ins], out_i, dict(axis=axis))
        elif code == B.RESHAPE:
            shp = tensor_data(ins[1]) if len(ins) > 1 else None
            if shp is None:
                opts = fb.ReshapeOptions()
                opts.Init(op.BuiltinOptions().Bytes, op.BuiltinOptions().Pos)
                shp = opts.NewShapeAsNumpy()
            emit("Reshape", name, [ir_tensor(ins[0])], out_i, dict(
                shape=[int(v) for v in np.asarray(shp).reshape(-1)],
                is_onnx=1, is_mxnet=0, reverse=0))
        elif code == B.SOFTMAX:
            emit("Softmax", name, [ir_tensor(ins[0])], out_i, dict(axis=1))
        elif code == B.RELU:
            emit("ReLu", name, [ir_tensor(ins[0])], out_i, dict(negative_slope=0.0))
        elif code == B.RELU6:
            emit("ReLu6", name, [ir_tensor(ins[0])], out_i, {})
        elif code == B.LOGISTIC:
            emit("Sigmoid", name, [ir_tensor(ins[0])], out_i, {})
        elif code == B.MEAN:
            axes = tensor_data(ins[1])
            if sorted(int(a) for a in np.asarray(axes).reshape(-1)) != [1, 2]:
                raise NotImplementedError("tflite MEAN over non-HW axes")
            emit("Pooling", name, [ir_tensor(ins[0])], out_i, dict(
                alg=1, kernel_h=0, kernel_w=0, stride_h=1, stride_w=1,
                global_pool=1, caffe_flavor=0,
                pad_h0=0, pad_h1=0, pad_w0=0, pad_w1=0))
        elif code == B.PAD:
            pads = np.asarray(tensor_data(ins[1])).reshape(-1, 2)
            emit("Pad", name, [ir_tensor(ins[0])], out_i, dict(
                mode=0, value=0.0,
                pad_n_0=int(pads[0, 0]), pad_n_1=int(pads[0, 1]),
                pad_c_0=int(pads[3, 0]), pad_c_1=int(pads[3, 1]),
                pad_h_0=int(pads[1, 0]), pad_h_1=int(pads[1, 1]),
                pad_w_0=int(pads[2, 0]), pad_w_1=int(pads[2, 1])))
        elif code == B.RESIZE_NEAREST_NEIGHBOR:
            size = tensor_data(ins[1])
            in_shape = sub.Tensors(ins[0]).ShapeAsNumpy()
            scale = float(np.asarray(size).reshape(-1)[0]) / float(in_shape[1])
            emit("Upsample", name, [ir_tensor(ins[0])], out_i, dict(scale=scale))
        else:
            raise NotImplementedError(f"tflite builtin op code {code}")

    for i in range(sub.OutputsLength()):
        ti = sub.Outputs(i)
        if ti in tmap:
            g.outputs.append(g.tensors[tmap[ti]].producer)
    return g
