"""Torch-checkpoint port: synthetic reference-layout state dicts -> our models.

Builds state dicts with the exact key names and tensor shapes the reference
checkpoints carry (G: SynthesizerTrn, D: MultiPeriodDiscriminator — layouts
documented in utils/torch_port.py), runs them through the port, and applies
the resulting params with our modules. Catches any key/shape/layout drift
between the port tables and the flax module trees.

(The numeric math of each layer mapping is pinned separately by the
torch-parity tests in test_layers.py; the full pretrained checkpoint isn't
available offline.)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from quickvc_tpu.config import ModelConfig
from quickvc_tpu.models.discriminators import MultiPeriodDiscriminator
from quickvc_tpu.models.synthesizer import SynthesizerTrn
from quickvc_tpu.utils.torch_port import port_discriminator, port_generator, to_jax


def _rng_arrays(rng):
    def conv(out, inp, k):  # torch Conv1d weight
        return rng.standard_normal((out, inp, k)).astype(np.float32) * 0.05

    return conv


def synth_generator_sd(rng, mc: ModelConfig, spec_channels: int) -> dict:
    """Reference SynthesizerTrn state dict (models.py:549-591 layout)."""
    conv = _rng_arrays(rng)
    h = mc.hidden_channels
    inter = mc.inter_channels
    gin = mc.gin_channels
    sd: dict[str, np.ndarray] = {}

    def wn_conv(prefix, out, inp, k):
        sd[f"{prefix}.weight_v"] = conv(out, inp, k)
        sd[f"{prefix}.weight_g"] = np.abs(rng.standard_normal((out, 1, 1))).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.standard_normal(out).astype(np.float32) * 0.01

    def plain_conv(prefix, out, inp, k):
        sd[f"{prefix}.weight"] = conv(out, inp, k)
        sd[f"{prefix}.bias"] = rng.standard_normal(out).astype(np.float32) * 0.01

    def wavenet(prefix, n_layers, gin_ch):
        if gin_ch:
            wn_conv(f"{prefix}.cond_layer", 2 * h * n_layers, gin_ch, 1)
        for i in range(n_layers):
            wn_conv(f"{prefix}.in_layers.{i}", 2 * h, h, 5)
            rs_out = 2 * h if i < n_layers - 1 else h
            wn_conv(f"{prefix}.res_skip_layers.{i}", rs_out, h, 1)

    def cond_normal(prefix, in_ch, n_layers, gin_ch):
        plain_conv(f"{prefix}.pre", h, in_ch, 1)
        wavenet(f"{prefix}.enc", n_layers, gin_ch)
        plain_conv(f"{prefix}.proj", 2 * inter, h, 1)

    cond_normal("enc_q", spec_channels, mc.enc_wn_layers, gin)
    cond_normal("enc_p", mc.unit_channels, mc.enc_wn_layers, 0)
    for i in range(mc.n_flows):
        p = f"flow.flows.{2 * i}"
        plain_conv(f"{p}.pre", h, inter // 2, 1)
        wavenet(f"{p}.enc", mc.flow_wn_layers, gin)
        plain_conv(f"{p}.post", inter // 2, h, 1)

    for layer in range(3):
        in_dim = 80 if layer == 0 else gin
        sd[f"enc_spk.lstm.weight_ih_l{layer}"] = rng.standard_normal((4 * gin, in_dim)).astype(np.float32) * 0.05
        sd[f"enc_spk.lstm.weight_hh_l{layer}"] = rng.standard_normal((4 * gin, gin)).astype(np.float32) * 0.05
        sd[f"enc_spk.lstm.bias_ih_l{layer}"] = np.zeros(4 * gin, np.float32)
        sd[f"enc_spk.lstm.bias_hh_l{layer}"] = np.zeros(4 * gin, np.float32)
    sd["enc_spk.linear.weight"] = rng.standard_normal((gin, gin)).astype(np.float32) * 0.05
    sd["enc_spk.linear.bias"] = np.zeros(gin, np.float32)

    uic = mc.upsample_initial_channel
    wn_conv("dec.conv_pre", uic, inter, 7)
    plain_conv("dec.cond", uic, gin, 1)
    num_kernels = len(mc.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(mc.upsample_rates, mc.upsample_kernel_sizes)):
        cin, cout = uic // (2 ** i), uic // (2 ** (i + 1))
        # ConvTranspose1d weight: (in, out, k); weight_norm dim=0 -> g (in,1,1)
        sd[f"dec.ups.{i}.weight_v"] = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.05
        sd[f"dec.ups.{i}.weight_g"] = np.abs(rng.standard_normal((cin, 1, 1))).astype(np.float32) + 0.5
        sd[f"dec.ups.{i}.bias"] = np.zeros(cout, np.float32)
        for j, (rk, rd) in enumerate(zip(mc.resblock_kernel_sizes, mc.resblock_dilation_sizes)):
            rp = f"dec.resblocks.{i * num_kernels + j}"
            for m in range(3):
                wn_conv(f"{rp}.convs1.{m}", cout, cout, rk)
                wn_conv(f"{rp}.convs2.{m}", cout, cout, rk)
    ch_final = uic // (2 ** len(mc.upsample_rates))
    n_freq = mc.gen_istft_n_fft // 2 + 1
    wn_conv("dec.subband_conv_post", mc.subbands * 2 * n_freq, ch_final, 7)
    sd["dec.multistream_conv_post.weight_v"] = rng.standard_normal((1, mc.subbands, 63)).astype(np.float32) * 0.05
    sd["dec.multistream_conv_post.weight_g"] = np.abs(rng.standard_normal((1, 1, 1))).astype(np.float32) + 0.5
    return sd


def test_generator_port_applies(rng):
    mc = ModelConfig(inter_channels=16, hidden_channels=16,
                     upsample_initial_channel=32, gin_channels=16,
                     unit_channels=12, resblock_kernel_sizes=(3,),
                     resblock_dilation_sizes=((1, 3, 5),),
                     enc_wn_layers=3, flow_wn_layers=2, n_flows=2)
    spec_ch = 33
    sd = synth_generator_sd(rng, mc, spec_ch)
    ported = to_jax(port_generator(sd, mc))

    net = SynthesizerTrn(spec_channels=spec_ch, segment_size=8, model=mc)
    f = 40
    unit = jnp.asarray(rng.standard_normal((1, f, 12)).astype(np.float32))
    spec = jnp.asarray(rng.standard_normal((1, f, spec_ch)).astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((1, f, 80)).astype(np.float32))
    init_vars = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, unit, spec, mel)

    # ported tree must be structurally identical to a fresh init
    init_shapes = jax.tree.map(lambda x: x.shape, init_vars["params"])
    port_shapes = jax.tree.map(lambda x: x.shape, ported)
    assert init_shapes == port_shapes

    g_vec = net.apply({"params": ported}, mel, method=SynthesizerTrn.embed_speaker)
    wave = net.apply({"params": ported}, unit, g_vec, 0.0, method=SynthesizerTrn.infer)
    assert wave.shape == (1, f * 320, 1)
    assert np.isfinite(np.asarray(wave)).all()


def synth_discriminator_sd(rng) -> dict:
    conv = _rng_arrays(rng)
    sd: dict[str, np.ndarray] = {}

    def wn1(prefix, out, inp, k, groups=1):
        sd[f"{prefix}.weight_v"] = conv(out, inp // groups, k)
        sd[f"{prefix}.weight_g"] = np.abs(rng.standard_normal((out, 1, 1))).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = np.zeros(out, np.float32)

    def wn2(prefix, out, inp, kh):
        sd[f"{prefix}.weight_v"] = rng.standard_normal((out, inp, kh, 1)).astype(np.float32) * 0.05
        sd[f"{prefix}.weight_g"] = np.abs(rng.standard_normal((out, 1, 1, 1))).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = np.zeros(out, np.float32)

    # DiscriminatorS = discriminators.0 (models.py:456-468)
    specs = [(16, 1, 15, 1), (64, 16, 41, 4), (256, 64, 41, 16),
             (1024, 256, 41, 64), (1024, 1024, 41, 256), (1024, 1024, 5, 1)]
    for i, (out, inp, k, g) in enumerate(specs):
        wn1(f"discriminators.0.convs.{i}", out, inp, k, g)
    wn1("discriminators.0.conv_post", 1, 1024, 3)
    # DiscriminatorP x5 (models.py:418-432)
    for d in range(1, 6):
        chans = [(32, 1), (128, 32), (512, 128), (1024, 512), (1024, 1024)]
        for i, (out, inp) in enumerate(chans):
            wn2(f"discriminators.{d}.convs.{i}", out, inp, 5)
        wn2(f"discriminators.{d}.conv_post", 1, 1024, 3)
    return sd


def test_discriminator_port_applies(rng):
    sd = synth_discriminator_sd(rng)
    ported = to_jax(port_discriminator(sd))
    net = MultiPeriodDiscriminator()
    y = jnp.asarray(rng.standard_normal((1, 10240, 1)).astype(np.float32) * 0.1)
    init_vars = net.init(jax.random.PRNGKey(0), y, y)
    init_shapes = jax.tree.map(lambda x: x.shape, init_vars["params"])
    port_shapes = jax.tree.map(lambda x: x.shape, ported)
    assert init_shapes == port_shapes
    logits_r, logits_g, _, _ = net.apply({"params": ported}, y, y)
    assert len(logits_r) == 6
    assert all(np.isfinite(np.asarray(l)).all() for l in logits_r)


class TorchDiscS(torch.nn.Module):
    """Scale-discriminator replica with the reference's conv stack shapes."""

    def __init__(self):
        super().__init__()
        wn = torch.nn.utils.weight_norm
        self.convs = torch.nn.ModuleList([
            wn(torch.nn.Conv1d(1, 16, 15, 1, padding=7)),
            wn(torch.nn.Conv1d(16, 64, 41, 4, groups=4, padding=20)),
            wn(torch.nn.Conv1d(64, 256, 41, 4, groups=16, padding=20)),
            wn(torch.nn.Conv1d(256, 1024, 41, 4, groups=64, padding=20)),
            wn(torch.nn.Conv1d(1024, 1024, 41, 4, groups=256, padding=20)),
            wn(torch.nn.Conv1d(1024, 1024, 5, 1, padding=2)),
        ])
        self.conv_post = wn(torch.nn.Conv1d(1024, 1, 3, 1, padding=1))

    def forward(self, x):
        for c in self.convs:
            x = torch.nn.functional.leaky_relu(c(x), 0.1)
        return self.conv_post(x)


class TorchDiscP(torch.nn.Module):
    """Period-discriminator replica (reshape to (T/p, p) + (5,1) conv stack)."""

    def __init__(self, period):
        super().__init__()
        self.period = period
        wn = torch.nn.utils.weight_norm
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        self.convs = torch.nn.ModuleList(
            [wn(torch.nn.Conv2d(i, o, (5, 1), (3, 1), padding=(2, 0))) for i, o in chans]
            + [wn(torch.nn.Conv2d(1024, 1024, (5, 1), 1, padding=(2, 0)))])
        self.conv_post = wn(torch.nn.Conv2d(1024, 1, (3, 1), 1, padding=(1, 0)))

    def forward(self, x):
        b, c, t = x.shape
        p = self.period
        if t % p:
            x = torch.nn.functional.pad(x, (0, p - t % p), "reflect")
            t = x.shape[-1]
        x = x.view(b, c, t // p, p)
        for conv in self.convs:
            x = torch.nn.functional.leaky_relu(conv(x), 0.1)
        return self.conv_post(x)


def test_discriminator_numeric_parity(rng):
    """Ported torch weights reproduce exact per-discriminator logits."""
    from quickvc_tpu.models.discriminators import DiscriminatorP, DiscriminatorS

    x = rng.standard_normal((1, 1, 3000)).astype(np.float32) * 0.2
    xt = torch.from_numpy(x)
    xj = jnp.asarray(x.transpose(0, 2, 1))

    ts = TorchDiscS().eval()
    tp = TorchDiscP(3).eval()  # period 3 exercises the reflect pad
    sd = {f"discriminators.0.{k}": v.detach().numpy() for k, v in ts.state_dict().items()}
    sd |= {f"discriminators.1.{k}": v.detach().numpy() for k, v in tp.state_dict().items()}
    ported = to_jax(port_discriminator(sd, periods=(3,)))

    with torch.no_grad():
        golden_s = ts(xt).flatten(1).numpy()
        golden_p = tp(xt).flatten(1).numpy()
    logits_s, _ = DiscriminatorS().apply({"params": ported["disc_s"]}, xj)
    np.testing.assert_allclose(np.asarray(logits_s), golden_s, atol=2e-4, rtol=1e-3)
    logits_p, _ = DiscriminatorP(3).apply({"params": ported["disc_p3"]}, xj)
    np.testing.assert_allclose(np.asarray(logits_p), golden_p, atol=2e-4, rtol=1e-3)
