"""Reverse checkpoint port: our params -> reference-layout .pth state dicts.

Round-trip guarantees:
- reference sd -> port -> export reproduces the sd bit-for-bit (every key,
  every tensor) for both G and D,
- a fresh flax init tree -> export -> port applies identically (the only
  non-identity slice is the structurally-unused res half of each WaveNet
  stack's last layer, which the reference layout does not represent).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from quickvc_tpu.config import ModelConfig
from quickvc_tpu.models.discriminators import MultiPeriodDiscriminator
from quickvc_tpu.models.synthesizer import SynthesizerTrn
from quickvc_tpu.utils.torch_export import (
    export_discriminator,
    export_generator,
    save_reference_checkpoint,
)
from quickvc_tpu.utils.torch_port import (
    load_torch_state_dict,
    port_discriminator,
    port_generator,
    to_jax,
)

from test_torch_port import synth_discriminator_sd, synth_generator_sd

SMALL = dict(inter_channels=16, hidden_channels=16, upsample_initial_channel=32,
             gin_channels=16, unit_channels=12, resblock_kernel_sizes=(3,),
             resblock_dilation_sizes=((1, 3, 5),), enc_wn_layers=3,
             flow_wn_layers=2, n_flows=2)


def assert_sd_equal(got: dict, want: dict):
    assert sorted(got) == sorted(want), (
        f"key drift: extra={sorted(set(got) - set(want))} "
        f"missing={sorted(set(want) - set(got))}")
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]), err_msg=k)


def test_generator_sd_round_trip(rng):
    mc = ModelConfig(**SMALL)
    sd = synth_generator_sd(rng, mc, spec_channels=33)
    back = export_generator(port_generator(sd, mc), mc)
    assert_sd_equal(back, sd)


def test_generator_sd_round_trip_all_decoders(rng):
    for kind in ("istft", "mb_istft"):
        flags = (dict(ms_istft_vits=False, istft_vits=True) if kind == "istft"
                 else dict(ms_istft_vits=False, mb_istft_vits=True))
        mc = ModelConfig(**SMALL, **flags)
        sd = synth_generator_sd(rng, mc, spec_channels=33)
        if kind == "istft":
            # single-band head: conv_post replaces the subband/multistream pair
            n_freq = mc.gen_istft_n_fft // 2 + 1
            ch = mc.upsample_initial_channel // (2 ** len(mc.upsample_rates))
            del sd["dec.multistream_conv_post.weight_v"]
            del sd["dec.multistream_conv_post.weight_g"]
            for suffix in ("weight_v", "weight_g", "bias"):
                sd[f"dec.conv_post.{suffix}"] = sd.pop(
                    f"dec.subband_conv_post.{suffix}")
            sd["dec.conv_post.weight_v"] = rng.standard_normal(
                (2 * n_freq, ch, 7)).astype(np.float32) * 0.05
            sd["dec.conv_post.weight_g"] = np.abs(rng.standard_normal(
                (2 * n_freq, 1, 1))).astype(np.float32) + 0.5
            sd["dec.conv_post.bias"] = np.zeros(2 * n_freq, np.float32)
        else:
            del sd["dec.multistream_conv_post.weight_v"]
            del sd["dec.multistream_conv_post.weight_g"]
        back = export_generator(port_generator(sd, mc), mc)
        assert_sd_equal(back, sd)


def test_discriminator_sd_round_trip(rng):
    sd = synth_discriminator_sd(rng)
    back = export_discriminator(port_discriminator(sd))
    assert_sd_equal(back, sd)


def test_init_tree_export_port_applies_identically(rng):
    """fresh init -> export -> port: same infer output (and same tree away
    from the unused last-layer res halves)."""
    mc = ModelConfig(**SMALL)
    net = SynthesizerTrn(spec_channels=33, segment_size=8, model=mc)
    f = 40
    unit = jnp.asarray(rng.standard_normal((1, f, 12)).astype(np.float32))
    spec = jnp.asarray(rng.standard_normal((1, f, 33)).astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((1, f, 80)).astype(np.float32))
    params = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, unit, spec, mel)["params"]

    back = to_jax(port_generator(export_generator(params, mc), mc))
    assert (jax.tree.map(lambda x: x.shape, back)
            == jax.tree.map(lambda x: x.shape, params))

    g_vec = net.apply({"params": params}, mel, method=SynthesizerTrn.embed_speaker)
    want = net.apply({"params": params}, unit, g_vec, 0.0,
                     method=SynthesizerTrn.infer)
    got = net.apply({"params": back}, unit, g_vec, 0.0,
                    method=SynthesizerTrn.infer)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_save_reference_checkpoint_schema(rng, tmp_path):
    """The written .pth matches the reference checkpoint schema and reloads
    through our own torch-port loader."""
    sd = synth_discriminator_sd(rng)
    path = str(tmp_path / "D_7.pth")
    save_reference_checkpoint(path, sd, iteration=7, learning_rate=2e-4)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"model", "iteration", "optimizer", "learning_rate"}
    assert ckpt["iteration"] == 7 and ckpt["learning_rate"] == 2e-4
    assert all(isinstance(v, torch.Tensor) for v in ckpt["model"].values())
    reloaded = load_torch_state_dict(path)
    assert_sd_equal(reloaded, sd)

    # and the full applies-path still works after a disk round trip
    ported = to_jax(port_discriminator(reloaded))
    y = jnp.asarray(rng.standard_normal((1, 6400, 1)).astype(np.float32) * 0.1)
    logits_r, _, _, _ = MultiPeriodDiscriminator().apply({"params": ported}, y, y)
    assert len(logits_r) == 6
