"""FusedDwPwChain: whole dw3x3+pw1x1 stack chains in one Pallas kernel
(ops/pallas/dwchain.py, relaxed tier — opt-in via Options.fuse_dwchain)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import tengine_tpu as tt
from tengine_tpu.convert.torch_frontend import from_torch
from tengine_tpu.graph.passes import fuse_activation, fuse_dwpw_chains
from tengine_tpu.ops import qmath
from tengine_tpu.quantize.quantizer import quantize_graph
from tengine_tpu.utils.config import Options


class DwNet(nn.Module):
    def __init__(self, C=8, n=3):
        super().__init__()
        layers = [nn.Conv2d(3, C, 3, 1, 1), nn.ReLU()]
        for _ in range(n):
            layers += [
                nn.Conv2d(C, C, 3, 1, 1, groups=C), nn.ReLU(),
                nn.Conv2d(C, C, 1), nn.ReLU(),
            ]
        # trailing non-fusable layer so every dw+pw pair is chain-eligible
        layers += [nn.Conv2d(C, C, 3, 1, 1)]
        self.body = nn.Sequential(*layers)

    def forward(self, x):
        return self.body(x)


def _graph():
    torch.manual_seed(0)
    g = from_torch(DwNet().eval(), torch.randn(2, 3, 10, 10))
    fuse_activation(g)
    return g


def test_pass_matches_runs():
    g = _graph()
    rng = np.random.default_rng(0)
    calib = [rng.standard_normal((2, 3, 10, 10)).astype(np.float32)]
    qg = quantize_graph(g, calib, scheme="uint8", algorithm="minmax")
    n = fuse_dwpw_chains(qg)
    assert n == 3  # all three dw+pw pairs, one chain
    chains = [nd for nd in qg.nodes if nd.op == "FusedDwPwChain"]
    assert len(chains) == 1
    assert len(chains[0].params["blocks"]) == 3


@pytest.mark.parametrize("scheme", ["uint8", "int8"])
def test_chain_matches_exact_engine(scheme, rng):
    """Relaxed chain (one rounding per chain, f32 carried between layers)
    stays within 2 LSB of the per-layer-rounding exact engine."""
    g = _graph()
    calib = [
        rng.standard_normal((2, 3, 10, 10)).astype(np.float32)
        for _ in range(4)
    ]
    qg = quantize_graph(g, calib, scheme=scheme, algorithm="minmax")
    t_in = qg.tensors[qg.input_tensors[0]]
    x = qmath.quantize_np(calib[0], t_in.quant, t_in.dtype)
    exact = (
        tt.compile_graph(qg, Options(quant_relaxed=False))
        .run(x)[0]
        .astype(np.int32)
    )
    chain = (
        tt.compile_graph(qg, Options(fuse_dwchain=True))
        .run(x)[0]
        .astype(np.int32)
    )
    diff = np.abs(chain - exact)
    assert diff.max() <= 2, f"max LSB diff {diff.max()}"
    assert diff.mean() < 0.2
