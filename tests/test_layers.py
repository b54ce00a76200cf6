"""Numerical parity of flax layers vs equivalent torch modules.

These tests pin down (a) the layer semantics (padding, norm, residual
order) and (b) the torch->flax weight-layout conversion, by building the
torch module independently from its published definition and copying
weights into the flax layer.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import pytest

from talkshow_tpu.convert import torch_weights as cw
from talkshow_tpu.models import layers as L


def _to_nwc(x_t):
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 1))


def _from_nwc(y):
    return np.asarray(y).transpose(0, 2, 1)


@pytest.mark.parametrize("sample,residual", [
    ("none", False), ("none", True), ("down", True), ("up", True), ("one", False),
])
def test_conv_norm_relu_matches_torch(sample, residual):
    torch.manual_seed(0)
    cin, cout, T, B = 8, 16, 20, 3

    if sample == "none":
        k, s, p = 3, 1, 1
        conv_t = tnn.Conv1d(cin, cout, k, s, p)
    elif sample == "one":
        k, s, p = 1, 1, 0
        conv_t = tnn.Conv1d(cin, cout, k, s, p)
    elif sample == "down":
        k, s, p = 4, 2, 1
        conv_t = tnn.Conv1d(cin, cout, k, s, p)
    else:
        k, s, p = 4, 2, 1
        conv_t = tnn.ConvTranspose1d(cin, cout, k, s, p)
    bn_t = tnn.BatchNorm1d(cout)
    bn_t.running_mean.normal_(); bn_t.running_var.uniform_(0.5, 2.0)
    bn_t.weight.data.normal_(); bn_t.bias.data.normal_()
    res_t = None
    if residual:
        if sample == "up":
            res_t = tnn.ConvTranspose1d(cin, cout, k, s, p)
        else:
            res_t = tnn.Conv1d(cin, cout, k, s, p)

    x_t = torch.randn(B, cin, T)
    with torch.no_grad():
        out_t = bn_t.eval()(conv_t(x_t))
        if residual:
            out_t = out_t + res_t(x_t)
        out_t = torch.nn.functional.leaky_relu(out_t, 0.2)

    layer = L.ConvNormRelu(cout, leaky=True, sample=sample, residual=residual)
    variables = layer.init(jax.random.PRNGKey(0), _to_nwc(x_t))
    conv_name = "ConvTranspose_0" if sample == "up" else "Conv_0"
    kfn = cw.conv1d_transpose_kernel if sample == "up" else cw.conv1d_kernel
    params = {conv_name: {"kernel": kfn(conv_t.weight), "bias": cw.t2j(conv_t.bias)}}
    stats = {}
    sd = {"bn.weight": bn_t.weight, "bn.bias": bn_t.bias,
          "bn.running_mean": bn_t.running_mean, "bn.running_var": bn_t.running_var}
    bn_params = {}
    cw.batchnorm(bn_params, stats, "bn", sd, "BatchNorm_0")
    params["TorchBatchNorm_0"] = bn_params
    stats = {"TorchBatchNorm_0": stats}
    if residual:
        params["residual_layer"] = {
            "kernel": kfn(res_t.weight), "bias": cw.t2j(res_t.bias)}
    out_j = layer.apply({"params": params, "batch_stats": stats}, _to_nwc(x_t),
                        False)
    np.testing.assert_allclose(_from_nwc(out_j), out_t.numpy(), atol=2e-5)


def test_cnr1d_layernorm_matches_torch():
    """The nets/layers.py variant with norm='ln' (LayerNorm over channels)."""
    torch.manual_seed(1)
    cin, cout, T, B = 6, 10, 15, 2
    conv_t = tnn.Conv1d(cin, cout, 3, 1, 1)
    ln_t = tnn.LayerNorm(cout)
    ln_t.weight.data.normal_(); ln_t.bias.data.normal_()
    res_t = tnn.Conv1d(cin, cout, 3, 1, 1)
    x_t = torch.randn(B, cin, T)
    with torch.no_grad():
        out_t = ln_t(conv_t(x_t).transpose(1, 2)).transpose(1, 2)
        out_t = out_t + res_t(x_t)
        out_t = torch.relu(out_t)

    layer = L.CNR1d(cout, residual=True, norm="ln")
    params = {
        "Conv_0": {"kernel": cw.conv1d_kernel(conv_t.weight), "bias": cw.t2j(conv_t.bias)},
        "LayerNorm_0": {"scale": cw.t2j(ln_t.weight), "bias": cw.t2j(ln_t.bias)},
        "residual_layer": {"kernel": cw.conv1d_kernel(res_t.weight), "bias": cw.t2j(res_t.bias)},
    }
    out_j = layer.apply({"params": params}, _to_nwc(x_t), False)
    np.testing.assert_allclose(_from_nwc(out_j), out_t.numpy(), atol=2e-5)


def test_linear_interpolate_matches_torch():
    torch.manual_seed(2)
    x_t = torch.randn(2, 8, 50)  # (B, C, T)
    for out_len in (30, 77, 50, 13):
        y_t = torch.nn.functional.interpolate(
            x_t, size=out_len, mode="linear", align_corners=False)
        y_j = L.linear_interpolate(_to_nwc(x_t), out_len)
        np.testing.assert_allclose(_from_nwc(y_j), y_t.numpy(), atol=1e-5)


def test_downsample_halves_length_odd():
    x = jnp.zeros((1, 301, 8))
    layer = L.ConvNormRelu(16, sample="down")
    v = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(v, x, False)
    assert y.shape == (1, 150, 16)  # torch floor((301+2-4)/2)+1 = 150


def test_upsample_doubles_length():
    x = jnp.zeros((1, 75, 8))
    layer = L.ConvNormRelu(16, sample="up")
    v = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(v, x, False)
    assert y.shape == (1, 150, 16)
