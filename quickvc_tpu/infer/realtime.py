"""Real-time streaming voice-conversion sessions.

``streaming.py`` synthesizes a *complete* utterance chunk-by-chunk inside a
``lax.scan``. This module is the live counterpart: a stateful session that
accepts fixed-size input chunks as they arrive (microphone, RTP, ...) and
returns converted audio with bounded, measurable latency — the serving shape
a production deployment needs (the reference has no streaming path at all;
its convert.py:58-86 processes whole files).

Design (TPU-first):

- ONE jitted step with static shapes — no recompiles for any stream length.
- Sliding window with **asymmetric context**: ``left`` frames of past context
  (free — the past already happened) and ``right`` frames of lookahead (the
  algorithmic latency). The step synthesizes the whole window and keeps only
  the ``chunk`` center frames, so interior output matches whole-utterance
  inference up to receptive-field truncation (encoders' WaveNet stacks see
  +-2*layers frames; the decoder MRF adds <1 latent frame).
- Batched sessions: the batch dim is N concurrent live streams — a server
  batches all active streams into one step per tick, which is how one chip
  serves hundreds of real-time conversions (scripts/realtime_bench.py).
- Two input domains:
  * ``RealtimeSession`` — push 256-d HuBERT-soft unit frames (content
    encoding happens elsewhere),
  * ``RealtimeWaveSession`` — push raw 16 kHz samples; the flax HuBERT-soft
    runs inside the same jitted step on the window (windowed attention is an
    approximation of HuBERT's global attention — quality degrades gracefully
    as ``left+right`` shrinks; 1-2 s of total context is transparent).

Stream timeline: the output lags the input by ``right`` frames. After k
pushes the session has returned ``k*chunk`` frames of audio covering input
frames ``[-right, k*chunk - right)`` (the first ``right`` frames are
lead-in synthesized from pre-session silence); :meth:`flush` drains the
final ``right`` frames. Dropping the first ``right*hop`` output samples
therefore yields audio aligned 1:1 with the pushed input.

Mouth-to-ear latency = chunk duration (input buffering) + right-lookahead
duration (algorithmic) + step compute time (measured on TPU by
scripts/realtime_bench.py).

Reference parity anchor: the synthesized path is exactly
``SynthesizerTrn.infer`` (reference models.py:625-642) on each window.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from quickvc_tpu.models.synthesizer import SynthesizerTrn


class RealtimeSession:
    """Stateful unit-domain streaming session (N concurrent streams).

    Push ``chunk`` unit frames per call; receive ``chunk*hop`` samples per
    call (delayed by ``right`` frames — see module docstring). Call
    :meth:`flush` at end-of-stream to drain the tail.
    """

    def __init__(self, net: SynthesizerTrn, params, g_vec, *, chunk: int = 16,
                 left: int = 48, right: int = 16, hop_length: int = 320,
                 unit_channels: int | None = None, noise_scale: float = 0.0,
                 seed: int = 0):
        if chunk < 1 or left < 0 or right < 0:
            raise ValueError("chunk >= 1, contexts >= 0 required")
        self.net, self.params = net, params
        self.g_vec = jnp.asarray(g_vec)
        self.batch = int(self.g_vec.shape[0])
        self.chunk, self.left, self.right = chunk, left, right
        self.hop = hop_length
        self.window = left + chunk + right
        self.noise_scale = float(noise_scale)
        self._key = jax.random.PRNGKey(seed)
        self._tick = 0
        dim = net.model.unit_channels if unit_channels is None else unit_channels
        self._buf = np.zeros((self.batch, self.window, dim), np.float32)
        self._step = jax.jit(self._make_step())

    # -- jitted core ---------------------------------------------------------

    def _make_step(self):
        net, left, chunk, hop = self.net, self.left, self.chunk, self.hop
        noise = self.noise_scale

        def step(params, units, g_vec, key):      # units: (N, window, C)
            rngs = {"sample": key} if noise != 0.0 else {}
            wave = net.apply({"params": params}, units, g_vec, noise,
                             method=SynthesizerTrn.infer, rngs=rngs)
            # (N, window*hop, 1) -> center chunk
            return jax.lax.dynamic_slice_in_dim(
                wave[..., 0], left * hop, chunk * hop, axis=1)

        return step

    # -- buffer plumbing (overridden by the wave-domain session) --------------

    def _roll_in(self, block: np.ndarray | None) -> None:
        if block is None:
            block = np.zeros((self.batch, self.chunk, self._buf.shape[-1]),
                             np.float32)
        self._buf = np.concatenate([self._buf[:, self.chunk:], block], axis=1)

    def _check(self, units: np.ndarray) -> np.ndarray:
        units = np.asarray(units, np.float32)
        want = (self.batch, self.chunk, self._buf.shape[-1])
        if units.shape != want:
            raise ValueError(f"expected {want} units, got {units.shape}")
        return units

    # -- public API ----------------------------------------------------------

    def push(self, units: np.ndarray) -> np.ndarray:
        """Feed one chunk per stream; get (N, chunk*hop) converted samples."""
        self._roll_in(self._check(units))
        return self._run()

    def flush(self) -> np.ndarray:
        """Drain the last ``right`` input frames: returns (N, right*hop)."""
        out = []
        remaining = self.right
        while remaining > 0:
            self._roll_in(None)   # zero-padded future
            out.append(self._run()[:, : min(remaining, self.chunk) * self.hop])
            remaining -= self.chunk
        return (np.concatenate(out, axis=1) if out
                else np.zeros((self.batch, 0), np.float32))

    def _run(self) -> np.ndarray:
        key = jax.random.fold_in(self._key, self._tick)
        self._tick += 1
        return np.asarray(self._step(self.params, jnp.asarray(self._buf),
                                     self.g_vec, key))


class RealtimeWaveSession(RealtimeSession):
    """Wave-in / wave-out live conversion: HuBERT-soft runs in the step.

    Push ``chunk*hop`` raw 16 kHz samples per stream per call. The jitted
    step encodes the whole (left+chunk+right)-frame wave window to units
    (windowed-attention HuBERT) and synthesizes it in one XLA program.
    """

    def __init__(self, net, params, g_vec, hubert, hubert_params, **kw):
        self.hubert, self.hubert_params = hubert, hubert_params
        super().__init__(net, params, g_vec, **kw)
        self._buf = np.zeros((self.batch, self.window * self.hop), np.float32)

    def _make_step(self):
        base = super()._make_step()
        hubert, hp = self.hubert, self.hubert_params

        def step(params, wave, g_vec, key):       # wave: (N, window*hop)
            units = hubert.apply(hp, wave, method=type(hubert).units)
            return base(params, units, g_vec, key)

        return step

    def _roll_in(self, block: np.ndarray | None) -> None:
        n = self.chunk * self.hop
        if block is None:
            block = np.zeros((self.batch, n), np.float32)
        self._buf = np.concatenate([self._buf[:, n:], block], axis=1)

    def _check(self, wave: np.ndarray) -> np.ndarray:
        wave = np.asarray(wave, np.float32)
        want = (self.batch, self.chunk * self.hop)
        if wave.shape != want:
            raise ValueError(f"expected {want} samples, got {wave.shape}")
        return wave
