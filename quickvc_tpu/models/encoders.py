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


def _lstm_cell(gates: jax.Array, c: jax.Array) -> tuple[jax.Array, jax.Array]:
    """torch gate order (i, f, g, o); any leading batch dims."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    return o * jnp.tanh(c), c


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM, input (B, T, C) -> final hidden (B, H).

    ``wavefront=True`` (default) runs all layers in ONE ``lax.scan`` on a
    pipeline wavefront — iteration k advances layer l on timestep k-l, so
    the three cell updates are independent and batch along a leading layer
    axis. Serial length drops num_layers*T -> T + num_layers - 1, which is
    what matters on TPU (the scan is latency-bound: per-layer unrolling
    does NOT help, scripts/bwd_experiments.py). Numerically EXACT vs the
    sequential schedule — each layer consumes the same inputs, one
    iteration later per layer (verified bit-exact in f32 and timed 12.8 ->
    9.7 ms fwd+bwd at batch 64 x 512 frames, scripts/lstm_wavefront.py).
    The param pytree is identical in both modes (torch-port compatible).
    """

    hidden_size: int
    num_layers: int = 3
    wavefront: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bsz = x.shape[0]
        hsz = self.hidden_size
        init = _torch_conv_init(1, hsz)  # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H))
        params = []
        in_ch = x.shape[-1]
        for layer in range(self.num_layers):
            ic = in_ch if layer == 0 else hsz
            params.append((
                self.param(f"w_ih_l{layer}", init, (4 * hsz, ic)),
                self.param(f"w_hh_l{layer}", init, (4 * hsz, hsz)),
                self.param(f"b_ih_l{layer}", init, (4 * hsz,)),
                self.param(f"b_hh_l{layer}", init, (4 * hsz,)),
            ))

        if self.wavefront and self.num_layers > 1:
            return self._wavefront(x, params)

        for layer in range(self.num_layers):
            w_ih, w_hh, b_ih, b_hh = params[layer]
            # Precompute input contributions for every timestep: one big matmul.
            x_proj = x @ w_ih.T.astype(x.dtype) + (b_ih + b_hh).astype(x.dtype)  # (B, T, 4H)

            def step(carry, xp, w_hh=w_hh):
                h, c = carry
                h, c = _lstm_cell(xp + h @ w_hh.T.astype(xp.dtype), c)
                return (h, c), h

            init_carry = (
                jnp.zeros((bsz, hsz), x.dtype),
                jnp.zeros((bsz, hsz), x.dtype),
            )
            (h_final, _), hs = jax.lax.scan(step, init_carry, x_proj.swapaxes(0, 1))
            x = hs.swapaxes(0, 1)  # (B, T, H) feeds the next layer
        return h_final

    def _wavefront(self, x: jax.Array, params) -> jax.Array:
        bsz, t, _ = x.shape
        dt = x.dtype
        hsz, L = self.hidden_size, self.num_layers
        # Layer-0 input projections for all timesteps: one big MXU matmul.
        w_ih0, _, b_ih0, b_hh0 = params[0]
        xp0 = x @ w_ih0.T.astype(dt) + (b_ih0 + b_hh0).astype(dt)      # (B,T,4H)
        w_hh = jnp.stack([p[1].T for p in params]).astype(dt)          # (L,H,4H)
        w_ih = jnp.stack([p[0].T for p in params[1:]]).astype(dt)      # (L-1,H,4H)
        b = jnp.stack([p[2] + p[3] for p in params[1:]]).astype(dt)    # (L-1,4H)

        # L-1 trailing flush iterations; invalid slots are masked so h/c
        # stay frozen (a zero gate input would still evolve the state).
        pad = jnp.zeros((L - 1, bsz, 4 * hsz), dt)
        xp_seq = jnp.concatenate([xp0.swapaxes(0, 1), pad], axis=0)    # (T+L-1,B,4H)
        steps = t + L - 1
        ks = np.arange(steps)[:, None]
        ls = np.arange(L)[None, :]
        valid = jnp.asarray((ks >= ls) & (ks < t + ls))                # (T+L-1, L)

        def step(carry, inp):
            # h,c: (L,B,H); h_prev: (L-1,B,H) = layer outputs from last iter
            h, c, h_prev = carry
            xp_k, valid_k = inp
            g_in = jnp.concatenate([
                xp_k[None],
                jnp.einsum("lbh,lhg->lbg", h_prev, w_ih) + b[:, None, :]], axis=0)
            gates = g_in + jnp.einsum("lbh,lhg->lbg", h, w_hh)
            h_new, c_new = _lstm_cell(gates, c)
            m = valid_k[:, None, None]
            h2 = jnp.where(m, h_new, h)
            c2 = jnp.where(m, c_new, c)
            return (h2, c2, h2[:-1]), None

        h0 = jnp.zeros((L, bsz, hsz), dt)
        (hf, _, _), _ = jax.lax.scan(step, (h0, h0, h0[:-1]), (xp_seq, valid))
        return hf[-1]


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
