"""Real-time streaming sessions: alignment, parity with full inference, e2e."""

import numpy as np

import jax
import jax.numpy as jnp

from quickvc_tpu.config import ModelConfig
from quickvc_tpu.infer import RealtimeSession, RealtimeWaveSession
from quickvc_tpu.models.hubert import HubertSoft
from quickvc_tpu.models.synthesizer import SynthesizerTrn

HOP = 320


def small_net(rng, unit_channels=12):
    mc = ModelConfig(inter_channels=16, hidden_channels=16,
                     upsample_initial_channel=32, gin_channels=16,
                     unit_channels=unit_channels, resblock_kernel_sizes=(3,),
                     resblock_dilation_sizes=((1, 3, 5),),
                     enc_wn_layers=2, flow_wn_layers=2, n_flows=2)
    net = SynthesizerTrn(spec_channels=33, segment_size=8, model=mc)
    unit = jnp.zeros((1, 40, unit_channels), jnp.float32)
    spec = jnp.zeros((1, 40, 33), jnp.float32)
    mel = jnp.zeros((1, 40, 80), jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)}, unit, spec, mel)
    g = rng.standard_normal((1, 16)).astype(np.float32)
    g /= np.linalg.norm(g)
    return net, variables["params"], jnp.asarray(g)


def test_realtime_session_matches_full_inference(rng):
    """Chunked live output == whole-utterance infer away from window edges."""
    net, params, g = small_net(rng)
    f, chunk, left, right = 96, 16, 32, 16
    unit = rng.standard_normal((1, f, 12)).astype(np.float32)

    full = np.asarray(net.apply({"params": params}, jnp.asarray(unit), g, 0.0,
                                method=SynthesizerTrn.infer))[0, :, 0]

    sess = RealtimeSession(net, params, g, chunk=chunk, left=left, right=right)
    outs = [sess.push(unit[:, i:i + chunk]) for i in range(0, f, chunk)]
    outs.append(sess.flush())
    stream = np.concatenate(outs, axis=1)[0]
    assert stream.shape == ((f + right) * HOP,)
    # Drop the right-lookahead lead-in: aligned 1:1 with the input stream.
    stream = stream[right * HOP:]
    a, b = full[HOP * 4: -HOP * 4], stream[HOP * 4: -HOP * 4]
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 5e-2, f"live/full mismatch rel={rel}"
    close = np.mean(np.abs(a - b) <= 1e-3 * (np.abs(a).max() + 1e-9))
    assert close > 0.95


def test_realtime_session_zero_right_context_is_causal(rng):
    """right=0: zero algorithmic lookahead, flush drains nothing."""
    net, params, g = small_net(rng)
    sess = RealtimeSession(net, params, g, chunk=8, left=24, right=0)
    unit = rng.standard_normal((1, 8, 12)).astype(np.float32)
    out = sess.push(unit)
    assert out.shape == (1, 8 * HOP)
    assert sess.flush().shape == (1, 0)


def test_realtime_batched_streams_are_independent(rng):
    """N batched sessions == N separate sessions (stream isolation)."""
    net, params, _ = small_net(rng)
    g = rng.standard_normal((3, 16)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    unit = rng.standard_normal((3, 32, 12)).astype(np.float32)

    batched = RealtimeSession(net, params, jnp.asarray(g),
                              chunk=16, left=16, right=8)
    got = np.concatenate([batched.push(unit[:, :16]),
                          batched.push(unit[:, 16:])], axis=1)
    for i in range(3):
        solo = RealtimeSession(net, params, jnp.asarray(g[i:i + 1]),
                               chunk=16, left=16, right=8)
        want = np.concatenate([solo.push(unit[i:i + 1, :16]),
                               solo.push(unit[i:i + 1, 16:])], axis=1)
        np.testing.assert_allclose(got[i], want[0], atol=2e-5)


def test_realtime_wave_session_end_to_end(rng):
    """Wave-in/wave-out with a tiny HuBERT front: shapes + finiteness."""
    net, params, g = small_net(rng, unit_channels=8)
    hub = HubertSoft(embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
                     extractor_channels=16, unit_dim=8, pos_kernel_size=16,
                     pos_groups=2)
    hp = jax.jit(lambda: hub.init(jax.random.PRNGKey(3),
                                  jnp.zeros((1, 4 * HOP), jnp.float32)))()
    sess = RealtimeWaveSession(net, params, g, hub, hp,
                               chunk=8, left=16, right=8)
    chunks = [rng.standard_normal((1, 8 * HOP)).astype(np.float32) * 0.1
              for _ in range(3)]
    outs = [sess.push(c) for c in chunks]
    outs.append(sess.flush())
    stream = np.concatenate(outs, axis=1)
    assert stream.shape == (1, (3 * 8 + 8) * HOP)
    assert np.isfinite(stream).all()
