"""Top-level QuickVC generator (CVAE + flow + iSTFT decoder).

Parity target: reference ``models.SynthesizerTrn`` (models.py:549-642):

- training ``__call__``: speaker LSTM on mel -> g; prior encoder on units ->
  (m_p, logs_p); posterior encoder on linear spec (speaker-conditioned) ->
  sampled z; flow z -> z_p; random 32-frame slice of z -> decoder -> 10240
  waveform samples.
- ``infer``: sliding-window speaker embedding; prior *sample* z_p; inverse
  flow -> z; decode full length. (Training decodes from the posterior;
  inference from the flow-inverted prior sample — reference models.py:638-639.)

Layouts: unit (B, F, 256), spec (B, F, 641), mel (B, F, 80) — all
channels-last time-major. Waveform out (B, T, 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from quickvc_tpu.config import ModelConfig
from quickvc_tpu.models.decoders import build_decoder
from quickvc_tpu.models.encoders import SpeakerEncoder
from quickvc_tpu.models.modules import CondNormalWN, ResidualCouplingBlock
from quickvc_tpu.ops.slicing import rand_slice_segments


class SynthesizerTrn(nn.Module):
    """QuickVC generator; needs rngs={'sample', 'slice'} for the training pass."""

    spec_channels: int
    segment_size: int  # decoder training segment [frames]
    model: ModelConfig

    def setup(self):
        m = self.model
        self.enc_q = CondNormalWN(m.inter_channels, m.hidden_channels, 5,
                                  m.enc_wn_layers, m.gin_channels, name="enc_q")
        self.enc_p = CondNormalWN(m.inter_channels, m.hidden_channels, 5,
                                  m.enc_wn_layers, 0, name="enc_p")
        self.flow = ResidualCouplingBlock(m.inter_channels, m.hidden_channels,
                                          5, m.flow_wn_layers, m.n_flows,
                                          m.gin_channels, name="flow")
        self.enc_spk = SpeakerEncoder(model_hidden_size=m.gin_channels,
                                      model_embedding_size=m.gin_channels, name="enc_spk")
        self.dec = build_decoder(m)

    def __call__(self, unit: jax.Array, spec: jax.Array, mel: jax.Array):
        """Training forward. Returns (y_hat, y_mb_hat, ids_slice, latents)."""
        g_vec = self.enc_spk(mel)                      # (B, gin)
        g = g_vec[:, None, :]                          # broadcast over frames (B, 1, gin)
        _, m_p, logs_p = self.enc_p(unit)
        z, m_q, logs_q = self.enc_q(spec, g)
        z_p = self.flow(z, g)
        z_slice, ids_slice = rand_slice_segments(
            self.make_rng("slice"), z, self.segment_size)
        o, o_mb = self.dec(z_slice, g)
        return o, o_mb, ids_slice, (z, z_p, m_p, logs_p, m_q, logs_q)

    def forward_posterior(self, spec: jax.Array, mel: jax.Array):
        """Training forward WITHOUT the prior encoder (split-prior step).

        Everything the D phase consumes: speaker embed, posterior sample,
        flow, sliced decode. The prior runs separately via
        :meth:`prior_stats` so the step can schedule its compute after the
        D update — at n>1 chips it then sits inside the D-phase gradient
        all-reduce window (train/step.py ``split_prior``). Note the
        'sample' rng stream differs from ``__call__`` (enc_p's discarded
        draw is skipped), so the two step layouts are equal in
        distribution, not bitwise.
        """
        g_vec = self.enc_spk(mel)
        g = g_vec[:, None, :]
        z, m_q, logs_q = self.enc_q(spec, g)
        z_p = self.flow(z, g)
        z_slice, ids_slice = rand_slice_segments(
            self.make_rng("slice"), z, self.segment_size)
        o, o_mb = self.dec(z_slice, g)
        return o, o_mb, ids_slice, (z, z_p, m_q, logs_q)

    def prior_stats(self, unit: jax.Array):
        """Prior encoder stats only: unit -> (m_p, logs_p)."""
        _, m_p, logs_p = self.enc_p(unit)
        return m_p, logs_p

    def infer(self, unit: jax.Array, g_vec: jax.Array, noise_scale: float = 1.0) -> jax.Array:
        """Inference from units + precomputed speaker embedding (B, gin).

        The sliding-window d-vector averaging lives outside the module (see
        ``encoders.embed_utterance_batch``) so this stays one static-shape jit.
        """
        g = g_vec[:, None, :]
        z_p, _, _ = self.enc_p(unit, noise_scale=noise_scale)
        z = self.flow(z_p, g, reverse=True)
        o, _ = self.dec(z, g)
        return o

    def embed_speaker(self, mel: jax.Array) -> jax.Array:
        """(B, F, 80) mel window batch -> (B, gin) d-vectors."""
        return self.enc_spk(mel)
