"""TFLite front-end: parity vs the TFLite interpreter (fp32 and full-int8)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tengine_tpu.convert.tflite_frontend import from_tflite
from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.utils.config import Options


def build_keras_net(rng):
    tf.keras.utils.set_random_seed(0)
    inp = tf.keras.Input((16, 16, 3), batch_size=1)
    x = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same", activation="relu")(inp)
    x = tf.keras.layers.DepthwiseConv2D(3, padding="same", activation="relu")(x)
    x = tf.keras.layers.MaxPool2D(2)(x)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    x = tf.keras.layers.Dense(10)(x)
    x = tf.keras.layers.Softmax()(x)
    return tf.keras.Model(inp, x)


def tflite_run(model_bytes, x_nhwc):
    it = tf.lite.Interpreter(model_content=model_bytes)
    it.allocate_tensors()
    ind = it.get_input_details()[0]
    x = x_nhwc
    if ind["dtype"] != np.float32:
        s, zp = ind["quantization"]
        x = np.clip(np.round(x / s) + zp, np.iinfo(ind["dtype"]).min,
                    np.iinfo(ind["dtype"]).max).astype(ind["dtype"])
    it.set_tensor(ind["index"], x)
    it.invoke()
    outd = it.get_output_details()[0]
    y = it.get_tensor(outd["index"])
    return x, y, ind, outd


def test_tflite_fp32(rng):
    model = build_keras_net(rng)
    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    blob = conv.convert()

    x_nhwc = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    _, y_tfl, _, _ = tflite_run(blob, x_nhwc)

    g = from_tflite(blob)
    x_nchw = np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))
    (y_ours,) = compile_graph(g, Options()).run(x_nchw)
    np.testing.assert_allclose(y_ours.reshape(y_tfl.shape), y_tfl, rtol=1e-4, atol=1e-5)


def test_tflite_full_int8(rng):
    """Full-integer PTQ tflite imports with quant params and matches the
    TFLite interpreter within a couple of LSB."""
    model = build_keras_net(rng)
    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]

    cal = [rng.standard_normal((1, 16, 16, 3)).astype(np.float32) for _ in range(8)]

    def rep():
        for c in cal:
            yield [c]

    conv.representative_dataset = rep
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.int8
    conv.inference_output_type = tf.int8
    blob = conv.convert()

    x_nhwc = cal[0]
    xq_tfl, y_tfl, ind, outd = tflite_run(blob, x_nhwc)

    g = from_tflite(blob)
    t_in = g.tensors[g.input_tensors[0]]
    assert t_in.quant is not None and t_in.dtype.np == np.int8
    xq_nchw = np.ascontiguousarray(xq_tfl.transpose(0, 3, 1, 2))
    (y_ours,) = compile_graph(g, Options(quant_mode="fast")).run(xq_nchw)

    diff = np.abs(y_ours.reshape(y_tfl.shape).astype(np.int32) - y_tfl.astype(np.int32))
    assert diff.max() <= 2, f"max LSB diff {diff.max()}"
