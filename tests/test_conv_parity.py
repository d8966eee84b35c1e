"""Parity of conv/convtr/lstm primitives vs the reference torch implementation."""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp

from audiocraft_tpu.nn.conv import (
    StreamableConv1d, StreamableConvTranspose1d,
    get_extra_padding_for_conv1d, pad1d,
)
from audiocraft_tpu.nn.lstm import StreamableLSTM
from audiocraft_tpu.ckpt.torch_import import (
    import_streamable_conv, import_streamable_convtr, import_lstm,
)


def _sd(mod):
    return {k: to_np(v) for k, v in mod.state_dict().items()}


@pytest.mark.parametrize("length,kernel,stride,pt", [
    (100, 7, 1, 6), (100, 8, 4, 4), (101, 16, 8, 8), (7, 7, 1, 6), (3, 7, 1, 6),
])
def test_extra_padding_math(length, kernel, stride, pt):
    import torch
    ref_conv = ref_module("audiocraft.modules.conv")
    x = torch.zeros(1, 1, length)
    expected = ref_conv.get_extra_padding_for_conv1d(x, kernel, stride, pt)
    assert get_extra_padding_for_conv1d(length, kernel, stride, pt) == expected


@pytest.mark.parametrize("length,pads,mode", [
    (100, (3, 3), "reflect"), (100, (4, 2), "reflect"), (5, (6, 6), "reflect"),
    (2, (6, 8), "reflect"), (100, (3, 3), "constant"), (1, (4, 4), "reflect"),
])
def test_pad1d(length, pads, mode):
    import torch
    ref_conv = ref_module("audiocraft.modules.conv")
    x = np.random.RandomState(0).randn(2, 3, length).astype(np.float32)
    ref = to_np(ref_conv.pad1d(to_torch(x), pads, mode))
    ours = np.asarray(pad1d(jnp.asarray(x), pads, mode))
    np.testing.assert_allclose(ours, ref, atol=0, rtol=0)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("norm", ["none", "weight_norm"])
@pytest.mark.parametrize("cin,cout,k,s,d,length", [
    (4, 8, 7, 1, 1, 100),
    (8, 16, 8, 4, 1, 101),
    (8, 8, 3, 1, 4, 64),
    (3, 5, 10, 5, 1, 47),
])
def test_streamable_conv1d_parity(causal, norm, cin, cout, k, s, d, length):
    import torch
    ref_conv = ref_module("audiocraft.modules.conv")
    torch.manual_seed(42)
    ref = ref_conv.StreamableConv1d(cin, cout, k, stride=s, dilation=d,
                                    causal=causal, norm=norm)
    ref.eval()
    x = np.random.RandomState(1).randn(2, cin, length).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x)))

    ours = StreamableConv1d(cin, cout, k, stride=s, dilation=d, causal=causal,
                            norm=norm)
    params = import_streamable_conv(_sd(ref), "")
    y = np.asarray(ours(jax.tree.map(jnp.asarray, params), jnp.asarray(x)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("causal,trim", [(False, 1.0), (True, 1.0), (True, 0.5), (True, 0.0)])
@pytest.mark.parametrize("cin,cout,k,s,length", [
    (8, 4, 8, 4, 25), (4, 2, 16, 8, 13), (6, 3, 10, 5, 20),
])
def test_streamable_convtr1d_parity(causal, trim, cin, cout, k, s, length):
    import torch
    ref_conv = ref_module("audiocraft.modules.conv")
    torch.manual_seed(0)
    ref = ref_conv.StreamableConvTranspose1d(cin, cout, k, stride=s,
                                             causal=causal, trim_right_ratio=trim)
    ref.eval()
    x = np.random.RandomState(2).randn(2, cin, length).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x)))

    ours = StreamableConvTranspose1d(cin, cout, k, stride=s, causal=causal,
                                     trim_right_ratio=trim)
    params = import_streamable_convtr(_sd(ref), "")
    y = np.asarray(ours(jax.tree.map(jnp.asarray, params), jnp.asarray(x)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("dim,layers,T", [(16, 2, 37), (8, 1, 10), (32, 3, 50)])
def test_streamable_lstm_parity(dim, layers, T):
    import torch
    ref_lstm_mod = ref_module("audiocraft.modules.lstm")
    torch.manual_seed(7)
    ref = ref_lstm_mod.StreamableLSTM(dim, num_layers=layers)
    ref.eval()
    x = np.random.RandomState(3).randn(2, dim, T).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x)))

    ours = StreamableLSTM(dim, num_layers=layers)
    params = import_lstm(_sd(ref), "", layers)
    y = np.asarray(ours(jax.tree.map(jnp.asarray, params), jnp.asarray(x)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-5)
