"""Speaker encoder: 3-layer LSTM d-vector model.

Parity target: reference ``models.SpeakerEncoder`` (models.py:507-546):
LSTM(80 -> 256, 3 layers, batch_first) -> Linear -> ReLU -> L2 normalize;
``embed_utterance`` averages embeddings of sliding 128-frame / 64-hop
partial windows (plus the final 128-frame window).

TPU-first: the LSTM is a ``lax.scan`` over time with the input projections
for all timesteps precomputed as one large batched matmul (MXU), leaving
only the small recurrent matmul inside the scan. Gate order matches torch
(i, f, g, o) so torch checkpoints port weight-for-weight.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from quickvc_tpu.models.layers import Dense, _torch_conv_init


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM, input (B, T, C) -> final hidden (B, H)."""

    hidden_size: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bsz = x.shape[0]
        hsz = self.hidden_size
        for layer in range(self.num_layers):
            in_ch = x.shape[-1]
            init = _torch_conv_init(1, hsz)  # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H))
            w_ih = self.param(f"w_ih_l{layer}", init, (4 * hsz, in_ch))
            w_hh = self.param(f"w_hh_l{layer}", init, (4 * hsz, hsz))
            b_ih = self.param(f"b_ih_l{layer}", init, (4 * hsz,))
            b_hh = self.param(f"b_hh_l{layer}", init, (4 * hsz,))

            # Precompute input contributions for every timestep: one big matmul.
            x_proj = x @ w_ih.T.astype(x.dtype) + (b_ih + b_hh).astype(x.dtype)  # (B, T, 4H)

            def step(carry, xp, w_hh=w_hh):
                h, c = carry
                gates = xp + h @ w_hh.T.astype(xp.dtype)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                return (h, c), h

            init_carry = (
                jnp.zeros((bsz, hsz), x.dtype),
                jnp.zeros((bsz, hsz), x.dtype),
            )
            (h_final, _), hs = jax.lax.scan(step, init_carry, x_proj.swapaxes(0, 1))
            x = hs.swapaxes(0, 1)  # (B, T, H) feeds the next layer
        return h_final


class SpeakerEncoder(nn.Module):
    """Mel (B, T, 80) -> L2-normalized d-vector (B, E)."""

    model_hidden_size: int = 256
    model_embedding_size: int = 256
    model_num_layers: int = 3

    @nn.compact
    def __call__(self, mels: jax.Array) -> jax.Array:
        h = LSTM(self.model_hidden_size, self.model_num_layers, name="lstm")(mels)
        e = Dense(self.model_embedding_size, name="linear")(h)
        e = jax.nn.relu(e)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


def partial_slices(total_frames: int, partial_frames: int = 128, partial_hop: int = 64) -> list[int]:
    """Sliding-window start indices (reference models.py:520-526)."""
    return list(range(0, total_frames - partial_frames, partial_hop))


def embed_utterance_batch(apply_fn, params, mel: jax.Array,
                         partial_frames: int = 128, partial_hop: int = 64,
                         pad_windows_to: int = 8) -> jax.Array:
    """Average d-vector over sliding partial windows (reference models.py:528-546).

    mel: (1, T, 80). Builds the window batch with static shapes (T is static
    under jit) and runs one batched encoder forward. The window count is
    padded up to a multiple of ``pad_windows_to`` (repeating the last window
    with zero weight in the mean) so serving sees a bounded set of XLA
    shapes instead of one compile per utterance length.
    """
    t = mel.shape[1]
    last = mel[:, -partial_frames:]
    starts = partial_slices(t, partial_frames, partial_hop)
    if t > partial_frames:
        windows = [mel[0, s : s + partial_frames] for s in starts] + [last[0]]
        n = len(windows)
        p = -(-n // pad_windows_to) * pad_windows_to
        windows += [windows[-1]] * (p - n)
        batch = jnp.stack(windows, axis=0)      # (P, partial, 80)
        embeds = apply_fn(params, batch)        # (P, E)
        weights = jnp.asarray(
            np.concatenate([np.full(n, 1.0 / n, np.float32),
                            np.zeros(p - n, np.float32)]))
        return (weights[None, :] @ embeds)      # (1, E): exact mean over real windows
    return apply_fn(params, last)
