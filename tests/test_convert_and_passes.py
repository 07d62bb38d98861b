"""Torch front-end converter + graph optimization pass tests."""

import numpy as np
import pytest

from tengine_tpu.executor.engine import compile_graph
from tengine_tpu.graph.passes import dce, fold_batchnorm, fuse_activation, optimize

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class SmallNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 8, 3, stride=2, padding=1)
        self.bn1 = nn.BatchNorm2d(8)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(8, 8, 3, padding=1, groups=8)  # depthwise
        self.conv3 = nn.Conv2d(8, 16, 1)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(16, 10)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.conv2(x))
        x = x + y
        x = self.conv3(x)
        x = self.pool(x)
        x = torch.flatten(x, 1)
        return self.fc(x)


class BranchNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.a = nn.Conv2d(3, 4, 1)
        self.b = nn.Conv2d(3, 4, 3, padding=1)
        self.head = nn.Conv2d(8, 2, 1)

    def forward(self, x):
        return self.head(torch.cat([self.a(x), self.b(x)], dim=1))


@pytest.mark.parametrize("cls", [SmallNet, BranchNet])
def test_torch_convert_matches_torch(cls, rng):
    from tengine_tpu.convert.torch_frontend import from_torch

    torch.manual_seed(0)
    model = cls().eval()
    x = torch.randn(1, 3, 16, 16)
    g = from_torch(model, x)

    with torch.no_grad():
        expected = model(x).numpy()
    (out,) = compile_graph(g).run(x.numpy())
    np.testing.assert_allclose(
        out.reshape(expected.shape), expected, rtol=1e-3, atol=1e-4
    )


def test_torch_convert_save_tmfile(tmp_path, rng):
    from tengine_tpu.convert.torch_frontend import from_torch
    from tengine_tpu.serializer.tm2.writer import save_tmfile
    import tengine_tpu as tt

    torch.manual_seed(0)
    model = SmallNet().eval()
    x = torch.randn(1, 3, 16, 16)
    g = from_torch(model, x)
    p = str(tmp_path / "torch.tmfile")
    save_tmfile(g, p)
    g2 = tt.load_model(p)
    (a,) = compile_graph(g).run(x.numpy())
    (b,) = compile_graph(g2).run(x.numpy())
    np.testing.assert_array_equal(a, b)


def test_fold_batchnorm(rng):
    from tengine_tpu.convert.torch_frontend import from_torch

    torch.manual_seed(1)
    model = SmallNet().eval()
    # make BN non-trivial
    with torch.no_grad():
        model.bn1.running_mean.uniform_(-1, 1)
        model.bn1.running_var.uniform_(0.5, 2)
        model.bn1.weight.uniform_(0.5, 1.5)
        model.bn1.bias.uniform_(-0.5, 0.5)
    x = torch.randn(1, 3, 16, 16)
    g = from_torch(model, x)
    n_bn = sum(1 for n in g.nodes if n.op == "BatchNormalization")
    assert n_bn == 1

    (before,) = compile_graph(g).run(x.numpy())
    folds = fold_batchnorm(g)
    assert folds == 1
    assert not any(n.op == "BatchNormalization" and n.outputs for n in g.nodes)
    (after,) = compile_graph(g).run(x.numpy())
    np.testing.assert_allclose(before, after, rtol=1e-4, atol=1e-5)


def test_fuse_activation(rng):
    from tengine_tpu.convert.torch_frontend import from_torch

    torch.manual_seed(2)
    model = BranchNet().eval()
    x = torch.randn(1, 3, 8, 8)
    g = from_torch(model, x)
    # append relu to head by building via torch Sequential instead
    model2 = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.ReLU()).eval()
    g2 = from_torch(model2, x)
    (before,) = compile_graph(g2).run(x.numpy())
    assert fuse_activation(g2) == 1
    conv = [n for n in g2.nodes if n.op == "Convolution"][0]
    assert conv.params["activation"] == 0
    (after,) = compile_graph(g2).run(x.numpy())
    np.testing.assert_allclose(before, after, rtol=1e-5, atol=1e-6)


def test_optimize_pipeline_on_imported(rng):
    """optimize() on an imported benchmark net keeps numerics."""
    from tengine_tpu.models.zoo import load_benchmark_model

    g = load_benchmark_model("squeezenet_v1.1", fill_missing_weights="random")
    for tid in g.input_tensors:
        g.tensors[tid].shape = [1, 3, 67, 67]
    x = rng.standard_normal((1, 3, 67, 67)).astype(np.float32)
    (before,) = compile_graph(g).run(x)
    optimize(g)
    (after,) = compile_graph(g).run(x)
    np.testing.assert_allclose(before, after, rtol=1e-4, atol=1e-5)


class StemNet(nn.Module):
    """Stride-2 stems of the three shapes stem_conv_s2d must map exactly:
    even kernel (yolov5 6x6 p2), odd kernel+odd pad (resnet 7x7 p3,
    mobilenet 3x3 p1)."""

    def __init__(self, k, p):
        super().__init__()
        self.conv = nn.Conv2d(3, 8, k, stride=2, padding=p)

    def forward(self, x):
        return self.conv(x)


@pytest.mark.parametrize("k,p", [(6, 2), (7, 3), (3, 1), (5, 2)])
def test_stem_conv_s2d_exact(k, p, rng):
    from tengine_tpu.convert.torch_frontend import from_torch
    from tengine_tpu.graph.passes import stem_conv_s2d
    from tengine_tpu.utils.config import Options

    torch.manual_seed(0)
    model = StemNet(k, p).eval()
    x = torch.randn(2, 3, 32, 32)
    g = from_torch(model, x)
    with torch.no_grad():
        expected = model(x).numpy()

    # pass applied directly (the compile-time gate excludes small inputs)
    g2 = g.clone()
    n = stem_conv_s2d(g2, min_kernel=0, min_hw=0)
    assert n == 1
    s2d = [nd for nd in g2.nodes if nd.op == "SpaceToDepth"]
    conv = [nd for nd in g2.nodes if nd.op == "Convolution"][0]
    assert len(s2d) == 1 and conv.params["stride_h"] == 1
    (out,) = compile_graph(g2, Options(stem_s2d=False)).run(x.numpy())
    np.testing.assert_allclose(out.reshape(expected.shape), expected, rtol=1e-4, atol=1e-5)
