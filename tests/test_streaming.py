"""Streaming-chunk inference: matches full-utterance inference in the interior."""

import numpy as np

import jax
import jax.numpy as jnp

from quickvc_tpu.config import ModelConfig
from quickvc_tpu.infer import streaming_infer
from quickvc_tpu.models.synthesizer import SynthesizerTrn


def test_streaming_matches_full(rng):
    mc = ModelConfig(inter_channels=16, hidden_channels=16,
                     upsample_initial_channel=32, gin_channels=16,
                     unit_channels=12, resblock_kernel_sizes=(3,),
                     resblock_dilation_sizes=((1, 3, 5),),
                     enc_wn_layers=2, flow_wn_layers=2, n_flows=2)
    net = SynthesizerTrn(spec_channels=33, segment_size=8, model=mc)
    f = 200
    unit = jnp.asarray(rng.standard_normal((1, f, 12)).astype(np.float32))
    spec = jnp.asarray(rng.standard_normal((1, 40, 33)).astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((1, 40, 80)).astype(np.float32))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, unit, spec, jnp.pad(mel, [(0, 0), (0, 0), (0, 0)]))
    g_vec = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
    g_vec = g_vec / jnp.linalg.norm(g_vec)

    full = np.asarray(net.apply(variables, unit, g_vec, 0.0,
                                method=SynthesizerTrn.infer))[0, :, 0]
    stream = np.asarray(streaming_infer(net, variables["params"], unit, g_vec,
                                        hop_length=320, chunk=64, context=48))[0]
    assert stream.shape == full.shape == (f * 320,)
    # Interior samples (away from utterance edges) must agree closely; the
    # context margin (48 frames) covers the encoders' receptive fields.
    a, b = full[320 * 4 : -320 * 4], stream[320 * 4 : -320 * 4]
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 5e-2, f"streaming/full mismatch rel={rel}"
    # And the overwhelming majority of samples are essentially identical.
    close = np.mean(np.abs(a - b) <= 1e-3 * (np.abs(a).max() + 1e-9))
    assert close > 0.95


def test_streaming_length_not_multiple_of_chunk(rng):
    mc = ModelConfig(inter_channels=16, hidden_channels=16,
                     upsample_initial_channel=32, gin_channels=16,
                     unit_channels=12, resblock_kernel_sizes=(3,),
                     resblock_dilation_sizes=((1, 3, 5),),
                     enc_wn_layers=2, flow_wn_layers=2, n_flows=2)
    net = SynthesizerTrn(spec_channels=33, segment_size=8, model=mc)
    f = 77  # not a multiple of chunk
    unit = jnp.asarray(rng.standard_normal((1, f, 12)).astype(np.float32))
    spec = jnp.asarray(rng.standard_normal((1, 40, 33)).astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((1, 40, 80)).astype(np.float32))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, unit, spec, mel)
    g_vec = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
    out = streaming_infer(net, variables["params"], unit, g_vec,
                          hop_length=320, chunk=32, context=16)
    assert out.shape == (1, f * 320)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_cli_context_covers_fullsize_receptive_field():
    """--context-frames default must cover the default (full-size) model's
    infer-path receptive field, or chunk interiors silently diverge from
    the batch path — found at full size on the real chip (round-5
    STREAMING_TPU artifact; the old default 48 was only enough for the
    shallow test models above)."""
    import os
    import re

    from quickvc_tpu.config import ModelConfig

    mc = ModelConfig()
    # per-side receptive field in frames: enc_p WN (k=5, dilation 1) is
    # +-2/layer; each flow coupling's WN likewise, couplings sequential;
    # decoder (conv_pre k7 + MRF at the upsampled rate) ~+-12 frames
    rf = 2 * mc.enc_wn_layers + 2 * mc.n_flows * mc.flow_wn_layers + 12
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "convert.py")).read()
    m = re.search(r'--context-frames", type=int, default=(\d+)', src)
    assert m, "convert.py --context-frames default not found"
    assert int(m.group(1)) >= rf, (int(m.group(1)), rf)
