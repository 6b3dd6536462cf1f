"""Streaming-chunk inference: constant-memory synthesis of long utterances.

The reference synthesizes whole utterances in one pass (convert.py:81); on
accelerators this means one XLA compilation per utterance length and O(T)
activation memory. This module runs the full inference path (prior encoder
-> inverse flow -> decoder) over fixed-size unit chunks inside a
``lax.scan``:

- ONE compiled program regardless of utterance length,
- O(chunk) device memory,
- bounded latency per chunk (streaming/real-time use).

Each chunk carries ``context`` frames of left/right context covering the
receptive fields of the WaveNet stacks (+-2*layers frames), the decoder MRF
(a few hundred samples at 16 kHz = <1 frame at the latent rate after the
upsampling), and the iSTFT/synthesis-filter overlaps; the context margins
are synthesized and discarded, so interior output matches full-utterance
inference up to receptive-field truncation (tested in
tests/test_streaming.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quickvc_tpu.models.synthesizer import SynthesizerTrn


def streaming_infer(
    net: SynthesizerTrn,
    params,
    unit: jax.Array,           # (B, F, unit_dim)
    g_vec: jax.Array,          # (B, gin)
    hop_length: int = 320,
    chunk: int = 96,           # frames synthesized per step
    context: int = 48,         # context frames on each side
    noise_scale: float = 0.0,
    rng: jax.Array | None = None,   # needed when noise_scale != 0
) -> jax.Array:
    """Chunked synthesis: returns (B, F * hop_length) waveform."""
    b, f, c = unit.shape
    n_chunks = -(-f // chunk)
    padded_f = n_chunks * chunk
    # layout: [context | padded units | context]
    unit_p = jnp.pad(unit, [(0, 0), (context, padded_f - f + context), (0, 0)])

    window = chunk + 2 * context
    if noise_scale != 0.0 and rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, i):
        win = jax.lax.dynamic_slice(unit_p, (0, i * chunk, 0), (b, window, c))
        rngs = {"sample": jax.random.fold_in(rng, i)} if rng is not None else {}
        wave = net.apply({"params": params}, win, g_vec, noise_scale,
                         method=SynthesizerTrn.infer, rngs=rngs)  # (B, window*hop, 1)
        out = jax.lax.dynamic_slice(
            wave[..., 0], (0, context * hop_length), (b, chunk * hop_length))
        return carry, out

    _, chunks = jax.lax.scan(body, None, jnp.arange(n_chunks))
    #  (n_chunks, B, chunk*hop) -> (B, padded_f*hop)
    out = chunks.transpose(1, 0, 2).reshape(b, padded_f * hop_length)
    return out[:, : f * hop_length]
