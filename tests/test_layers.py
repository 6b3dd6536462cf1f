"""Primitive-layer parity vs torch: convs, transposed convs, weight norm, LSTM.

These pin the exact semantics needed for torch-checkpoint porting and the
reference's conv arithmetic (padding / output_padding / groups / dim=0
weight-norm axes).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from quickvc_tpu.models.layers import Conv1d, ConvTranspose1d, WNConv1d
from quickvc_tpu.models.discriminators import WNConv2d
from quickvc_tpu.models.encoders import LSTM, SpeakerEncoder


def test_conv1d_same_matches_torch(rng):
    x = rng.standard_normal((2, 50, 8)).astype(np.float32)
    tconv = torch.nn.Conv1d(8, 16, 5, padding="same")
    w = tconv.weight.detach().numpy()  # (out, in, k)
    b = tconv.bias.detach().numpy()
    m = Conv1d(16, 5)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    golden = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-5)


def test_conv1d_dilated_matches_torch(rng):
    x = rng.standard_normal((1, 64, 4)).astype(np.float32)
    tconv = torch.nn.Conv1d(4, 4, 3, dilation=5, padding=5)
    m = Conv1d(4, 3, dilation=5, padding=5)
    params = {"params": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 1, 0)),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    golden = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-5)


def test_grouped_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 40, 16)).astype(np.float32)
    tconv = torch.nn.Conv1d(16, 64, 41, stride=4, groups=4, padding=20)
    m = Conv1d(64, 41, stride=4, groups=4, padding=20)
    params = {"params": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 1, 0)),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    golden = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-4)


def test_weight_norm_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 30, 8)).astype(np.float32)
    tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 12, 5, padding="same"))
    v = tconv.weight_v.detach().numpy()  # (out, in, k)
    g = tconv.weight_g.detach().numpy()  # (out, 1, 1)
    b = tconv.bias.detach().numpy()
    m = WNConv1d(12, 5)
    params = {"params": {"v": jnp.asarray(v.transpose(2, 1, 0)),
                         "g": jnp.asarray(g[:, 0, 0]),
                         "bias": jnp.asarray(b)}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    golden = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("case", [
    # (in_len, k, stride, pad, outpad) — the reference's exact upsample arithmetics
    (32, 16, 5, 6, 1),   # MS/MB stage i=0 (models.py:334-335)
    (160, 16, 4, 6, 0),  # MS/MB stage i=1
    (32, 16, 5, 5, 0),   # iSTFT_Generator stage (models.py:127-128)
])
def test_conv_transpose_matches_torch(rng, case):
    in_len, k, stride, pad, outpad = case
    x = rng.standard_normal((2, in_len, 6)).astype(np.float32)
    tconv = torch.nn.utils.weight_norm(
        torch.nn.ConvTranspose1d(6, 4, k, stride, padding=pad, output_padding=outpad))
    v = tconv.weight_v.detach().numpy()  # (in, out, k)
    g = tconv.weight_g.detach().numpy()  # (in, 1, 1)
    b = tconv.bias.detach().numpy()
    m = ConvTranspose1d(4, k, stride, padding=pad, output_padding=outpad)
    params = {"params": {"v": jnp.asarray(v.transpose(2, 1, 0)),
                         "g": jnp.asarray(g[:, 0, 0]),
                         "bias": jnp.asarray(b)}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    golden = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    assert ours.shape[1] == golden.shape[2] == (in_len - 1) * stride - 2 * pad + k + outpad
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden, atol=1e-5, rtol=1e-4)


def test_weight_norm_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 20, 3, 1)).astype(np.float32)  # NHWC
    tconv = torch.nn.utils.weight_norm(torch.nn.Conv2d(1, 8, (5, 1), (3, 1), padding=(2, 0)))
    v = tconv.weight_v.detach().numpy()  # (out, in, kh, kw)
    g = tconv.weight_g.detach().numpy()
    b = tconv.bias.detach().numpy()
    m = WNConv2d(8, (5, 1), (3, 1), (2, 0))
    params = {"params": {"v": jnp.asarray(v.transpose(2, 3, 1, 0)),
                         "g": jnp.asarray(g.reshape(-1)),
                         "bias": jnp.asarray(b)}}
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    golden = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), golden, atol=1e-5, rtol=1e-4)


def test_lstm_matches_torch(rng):
    b, t, cin, h = 3, 20, 80, 32
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    tlstm = torch.nn.LSTM(cin, h, 3, batch_first=True)
    params = {}
    for layer in range(3):
        params[f"w_ih_l{layer}"] = jnp.asarray(getattr(tlstm, f"weight_ih_l{layer}").detach().numpy())
        params[f"w_hh_l{layer}"] = jnp.asarray(getattr(tlstm, f"weight_hh_l{layer}").detach().numpy())
        params[f"b_ih_l{layer}"] = jnp.asarray(getattr(tlstm, f"bias_ih_l{layer}").detach().numpy())
        params[f"b_hh_l{layer}"] = jnp.asarray(getattr(tlstm, f"bias_hh_l{layer}").detach().numpy())
    m = LSTM(h, 3)
    ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    _, (hidden, _) = tlstm(torch.from_numpy(x))
    golden = hidden[-1].detach().numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-4)


def test_speaker_encoder_normalized(rng):
    m = SpeakerEncoder(model_hidden_size=64, model_embedding_size=64)
    x = jnp.asarray(rng.standard_normal((4, 30, 80)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    e = np.asarray(m.apply(params, x))
    assert e.shape == (4, 64)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)


def test_wavenet_port_matches_torch_recurrence(rng):
    """Validate the scanned WaveNet against a torch per-layer recurrence.

    Builds weight-normed torch convs with the reference's layer shapes (last
    res_skip layer h-wide), runs the WN recurrence explicitly, then ports the
    state dict through utils.torch_port._wavenet and compares.
    """
    import jax

    from quickvc_tpu.models.modules import WaveNet
    from quickvc_tpu.utils.torch_port import _wavenet
    from quickvc_tpu.utils.torch_port import to_jax

    h, L, k, gin, b, t = 8, 4, 5, 6, 2, 12
    tc = {}
    tc["cond_layer"] = torch.nn.utils.weight_norm(torch.nn.Conv1d(gin, 2 * h * L, 1))
    for i in range(L):
        tc[f"in_{i}"] = torch.nn.utils.weight_norm(torch.nn.Conv1d(h, 2 * h, k, padding="same"))
        rs_out = 2 * h if i < L - 1 else h
        tc[f"rs_{i}"] = torch.nn.utils.weight_norm(torch.nn.Conv1d(h, rs_out, 1))

    x = torch.from_numpy(rng.standard_normal((b, h, t)).astype(np.float32))
    g = torch.from_numpy(rng.standard_normal((b, gin, 1)).astype(np.float32))
    with torch.no_grad():
        g_all = tc["cond_layer"](g)
        xt, out = x, torch.zeros_like(x)
        for i in range(L):
            x_in = tc[f"in_{i}"](xt) + g_all[:, 2 * h * i : 2 * h * (i + 1)]
            acts = torch.tanh(x_in[:, :h]) * torch.sigmoid(x_in[:, h:])
            rs = tc[f"rs_{i}"](acts)
            if i < L - 1:
                xt = xt + rs[:, :h]
                out = out + rs[:, h:]
            else:
                out = out + rs
    golden = out.numpy()

    # export with reference key names for the port
    sd = {}
    for name, mod in tc.items():
        key = {"cond_layer": "wn.cond_layer"}.get(name)
        if key is None:
            idx = name.split("_")[1]
            key = f"wn.in_layers.{idx}" if name.startswith("in_") else f"wn.res_skip_layers.{idx}"
        sd[f"{key}.weight_v"] = mod.weight_v.detach().numpy()
        sd[f"{key}.weight_g"] = mod.weight_g.detach().numpy()
        sd[f"{key}.bias"] = mod.bias.detach().numpy()

    params = to_jax(_wavenet(sd, "wn", L, has_cond=True))
    m = WaveNet(hidden_channels=h, kernel_size=k, n_layers=L, gin_channels=gin)
    ours = m.apply({"params": params},
                   jnp.asarray(x.numpy().transpose(0, 2, 1)),
                   jnp.asarray(g.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), golden,
                               atol=1e-5, rtol=1e-4)


def test_coupling_layer_port_matches_torch(rng):
    """Shift-only coupling: split order, WN conditioning, zero-post, flip.

    Torch side built from primitives with the reference's recurrence
    (modules.py:199-224); ported through torch_port helpers.
    """
    from quickvc_tpu.models.modules import ResidualCouplingLayer, flip_features
    from quickvc_tpu.utils.torch_port import _plain_conv, _wavenet, to_jax

    ch, h, L, gin, b, t = 8, 12, 3, 6, 2, 10
    half = ch // 2
    pre = torch.nn.Conv1d(half, h, 1)
    post = torch.nn.Conv1d(h, half, 1)   # NOT zeroed: exercises real math
    cond = torch.nn.utils.weight_norm(torch.nn.Conv1d(gin, 2 * h * L, 1))
    ins = [torch.nn.utils.weight_norm(torch.nn.Conv1d(h, 2 * h, 5, padding="same"))
           for _ in range(L)]
    rss = [torch.nn.utils.weight_norm(torch.nn.Conv1d(h, 2 * h if i < L - 1 else h, 1))
           for i in range(L)]

    x = torch.from_numpy(rng.standard_normal((b, ch, t)).astype(np.float32))
    g = torch.from_numpy(rng.standard_normal((b, gin, 1)).astype(np.float32))
    with torch.no_grad():
        x0, x1 = x[:, :half], x[:, half:]
        hh = pre(x0)
        g_all = cond(g)
        out = torch.zeros_like(hh)
        for i in range(L):
            xi = ins[i](hh) + g_all[:, 2 * h * i : 2 * h * (i + 1)]
            acts = torch.tanh(xi[:, :h]) * torch.sigmoid(xi[:, h:])
            rs = rss[i](acts)
            if i < L - 1:
                hh = hh + rs[:, :h]
                out = out + rs[:, h:]
            else:
                out = out + rs
        m = post(out)
        golden = torch.flip(torch.cat([x0, x1 + m], dim=1), [1]).numpy()

    sd = {}
    for name, mod in [("pre", pre), ("post", post)]:
        sd[f"c.{name}.weight"] = mod.weight.detach().numpy()
        sd[f"c.{name}.bias"] = mod.bias.detach().numpy()
    sd["c.enc.cond_layer.weight_v"] = cond.weight_v.detach().numpy()
    sd["c.enc.cond_layer.weight_g"] = cond.weight_g.detach().numpy()
    sd["c.enc.cond_layer.bias"] = cond.bias.detach().numpy()
    for i, (a, r) in enumerate(zip(ins, rss)):
        for key, mod in [(f"c.enc.in_layers.{i}", a), (f"c.enc.res_skip_layers.{i}", r)]:
            sd[f"{key}.weight_v"] = mod.weight_v.detach().numpy()
            sd[f"{key}.weight_g"] = mod.weight_g.detach().numpy()
            sd[f"{key}.bias"] = mod.bias.detach().numpy()

    params = to_jax({
        "pre": _plain_conv(sd, "c.pre"),
        "enc": _wavenet(sd, "c.enc", L, True),
        "post": _plain_conv(sd, "c.post"),
    })
    layer = ResidualCouplingLayer(ch, h, 5, L, gin)
    y = layer.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 1)),
                    jnp.asarray(g.numpy().transpose(0, 2, 1)))
    ours = np.asarray(flip_features(y)).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-3)
