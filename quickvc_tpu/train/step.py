"""The jitted GAN training step (D update then G update, one compiled fn).

Reference parity (train.py:117-162 per-step semantics):

1. mel from spec; generator forward (posterior sample, random 32-frame
   slice) -> y_hat; slice the target wave to the same segment.
2. D phase: D(y, stop_grad(y_hat)); LSGAN loss; AdamW update of D.
3. G phase: with the *updated* D (the reference's second net_d pass at
   train.py:141 runs after optim_d.step()): LSGAN G + 2x L1 feature matching
   + 45 * mel-L1 + 1.0 * KL (+ sub-band MR-STFT for the MB decoder);
   AdamW update of G.

The generator forward runs ONCE per step via ``jax.vjp``: its output feeds
the D phase detached, and its saved residuals are reused to pull the G-loss
cotangents back through the generator — exactly the reference's
backward-through-saved-graph structure (train.py:126,141-156), one full
generator forward cheaper than re-running the forward inside the G grad.
The whole step stays one pure jitted function with a donated carry.

Parallelism: the step is sharding-agnostic. Under a ``('data',)`` mesh the
loop passes batch-sharded inputs and replicated state; GSPMD inserts the
gradient ``psum`` over ICI automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from quickvc_tpu.config import QuickVCConfig
from quickvc_tpu.dsp.pqmf import PQMFBank
from quickvc_tpu.dsp.stft import spec_to_mel, wave_to_mel, wave_to_spec_halo
from quickvc_tpu.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
    subband_stft_loss,
)
from quickvc_tpu.ops.slicing import slice_segments
from quickvc_tpu.train.state import TrainState, make_optimizer


def _finite_flag(tree, *scalars, loss_max: float = 0.0,
                 check_tree: bool = True) -> jax.Array:
    """Scalar bool: ``tree`` (and the extra scalars) contain no inf/nan.

    One fused f32 sum per leaf + a scalar isfinite per leaf, AND-reduced:
    NaN/Inf propagate into a leaf's sum, so a non-finite flag ⇔ poisoned
    grads. Checking per leaf (rather than one global accumulator) bounds
    the false-skip risk to a single leaf's sum overflowing f32 — ~1e38
    magnitudes inside ONE tensor, at which point skipping the step is the
    right call anyway. Still one read of the grads vs ~3 full param/moment
    passes for the where-select of the states.

    ``loss_max`` (>0): additionally require every scalar's magnitude below
    it — fp16-overflow parity. The reference trains under fp16 autocast
    (train.py:117-131): any loss this large would have overflowed to inf
    in fp16 and GradScaler would skip the step. bf16's f32-sized exponent
    keeps such steps finite, so without this check their poisoned updates
    are APPLIED (measured on the real-unit overfit: recurring 1e12..1e31
    loss spikes, each taking ~10 steps to recover from — BENCH.md).

    ``check_tree=False`` skips the per-leaf grad sums (guard_nonfinite off,
    loss threshold on): only the scalar checks run — the scalars still
    catch inf/nan losses, whose grads the step would apply otherwise.
    """
    ok = jnp.asarray(True)
    if check_tree:
        for leaf in jax.tree.leaves(tree):
            ok = ok & jnp.isfinite(jnp.sum(leaf.astype(jnp.float32)))
    for s in scalars:
        s = s.astype(jnp.float32)
        ok = ok & jnp.isfinite(s)
        if loss_max > 0:
            ok = ok & (jnp.abs(s) < loss_max)
    return ok


def _select_state(ok: jax.Array, new, old):
    """Elementwise pick ``new`` when ok else ``old`` (same pytree).

    Measured A/B at full size (b64 x 512 f bf16, 2026-08-19): this
    where-select formulation costs +1.2 ms/step (+1%) — XLA fuses the
    selects into the optimizer-update epilogue — while a ``lax.cond`` skip
    (optax.apply_if_finite style) costs +2.9 ms: the cond boundary blocks
    fusion/aliasing even though only one branch executes."""
    return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)


def make_train_step(cfg: QuickVCConfig, net_g, net_d, mel_basis,
                    debug_grads: bool = False,
                    grad_reduce=None, scalar_reduce=None):
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    ``debug_grads``: also return the raw D/G gradient pytrees in the metrics
    (``debug/d_grads``, ``debug/g_grads``) — test-only, used by the
    gradient-differential parity test against the reference's autograd
    (reference train.py:123-156 backward semantics).

    ``grad_reduce``/``scalar_reduce``: cross-device reduction hooks for the
    explicit-collective (shard_map) data-parallel wrapper
    (``parallel.make_sharded_train_step``). ``grad_reduce`` turns shard-local
    gradients into the global batch-mean gradient (a ``psum``/``pmean``,
    optionally in bf16 to halve ICI traffic); ``scalar_reduce`` does the same
    for loss scalars so the non-finite guard and the logged metrics are
    identical on every shard. Default None = GSPMD mode: the step is
    sharding-agnostic and XLA inserts the f32 gradient psum automatically.
    """

    opt = make_optimizer(cfg)
    guard_grads = cfg.train.guard_nonfinite
    guard_loss_max = float(getattr(cfg.train, "guard_loss_max", 0.0) or 0.0)
    # Either protection alone activates the skip machinery: guard_loss_max
    # with guard_nonfinite=False runs only the (nearly free) scalar loss
    # checks — no per-leaf grad sums (ADVICE r3: the threshold used to be
    # silently inert without the grad guard).
    guard = guard_grads or guard_loss_max > 0
    hop = cfg.data.hop_length
    seg_frames = cfg.segment_frames
    seg_samples = cfg.train.segment_size
    compute_dtype = jnp.bfloat16 if cfg.train.precision == "bf16" else jnp.float32
    use_subband_loss = cfg.model.mb_istft_vits
    pqmf = PQMFBank(cfg.model.subbands) if use_subband_loss else None

    split_prior = getattr(cfg.train, "split_prior", False)

    def g_forward(g_params, unit, spec, mel, rngs):
        return net_g.apply({"params": g_params}, unit.astype(compute_dtype),
                           spec.astype(compute_dtype), mel.astype(compute_dtype),
                           rngs=rngs)

    def train_step(state: TrainState, batch: dict[str, jax.Array], rng: jax.Array):
        # Wire format detected from the batch keys at trace time: the
        # config's train.transfer drives the LOADER side (data/dataset.py
        # collate), while the step accepts either format — direct callers
        # (tests, benches, dryruns) can feed full-mode batches regardless
        # of the config default.
        if "wave_s16" in batch:
            # Reconstruct the full-mode (unit, spec, wave) on-device from
            # the compact wire format (data/dataset.py collate_batch):
            # s16 PCM /32768 is the exact f32 the host would have sent;
            # the halo'd valid framing sees the same samples the host STFT
            # saw; frames/samples past n_take are masked to the full
            # path's zero tails. Device cost: +0.8 ms/step at b64 x 512f
            # with the fused Pallas spec below (the XLA f32-HIGHEST DFT
            # path costs +6.0 ms — measured A/B, BENCH.md); saves ~120 MB
            # of H2D per b64 batch.
            unit = batch["unit"]
            pad = (cfg.data.filter_length - hop) // 2
            wf = batch["wave_s16"].astype(jnp.float32) / 32768.0
            frames_l = unit.shape[1]
            if jax.default_backend() == "cpu":
                spec = wave_to_spec_halo(wf, cfg.data.filter_length, hop,
                                         cfg.data.win_length)
            else:
                # Fused Pallas framing+DFT+magnitude: the spec is not
                # differentiated (batch-derived), so the kernel needs no
                # VJP; saves ~6 ms of f32-HIGHEST XLA DFT per b64 step
                # (interpret-mode parity: tests/test_pallas.py)
                from quickvc_tpu.ops.fused_mel import wave_to_spec_halo_pallas

                spec = wave_to_spec_halo_pallas(wf, cfg.data.filter_length,
                                                hop, cfg.data.win_length)
            fmask = (jnp.arange(frames_l)[None, :]
                     < batch["n_take"][:, None])
            spec = spec * fmask[..., None]
            y = wf[:, pad:-pad, None]
            smask = (jnp.arange(frames_l * hop)[None, :]
                     < batch["n_take"][:, None] * hop)
            y = y * smask[..., None]
        else:
            unit, spec, y = batch["unit"], batch["spec"], batch["wave"]
        rng_sample, rng_slice, rng_prior = jax.random.split(rng, 3)
        rngs = {"sample": rng_sample, "slice": rng_slice}

        mel = spec_to_mel(spec, mel_basis)

        # ---- Generator forward, ONCE, with saved residuals (jax.vjp) ----
        # Differentiable outputs (f32) are primal outputs; the integer slice
        # ids ride along as aux so no cotangent is needed for them.
        # ``split_prior``: enc_p feeds ONLY the KL loss, not the D phase —
        # its forward can therefore run in its own vjp placed after the D
        # update, where at n>1 chips XLA's latency-hiding scheduler may
        # overlap its ~6 ms of compute with the D-phase 187 MB gradient
        # all-reduce (VERDICT r3 item 8). Single-chip A/B in BENCH.md.
        def g_fwd_fn(g_params):
            if split_prior:
                o, o_mb, ids, latents = net_g.apply(
                    {"params": g_params}, spec.astype(compute_dtype),
                    mel.astype(compute_dtype), rngs=rngs,
                    method="forward_posterior")
            else:
                o, o_mb, ids, latents = g_forward(g_params, unit, spec, mel,
                                                  rngs)
            o = o.astype(jnp.float32)
            o_mb = None if o_mb is None else o_mb.astype(jnp.float32)
            latents = tuple(t.astype(jnp.float32) for t in latents)
            return (o, o_mb, latents), ids

        (y_hat, y_hat_mb, latents), g_vjp, ids_slice = jax.vjp(
            g_fwd_fn, state.g_params, has_aux=True)
        y_seg = slice_segments(y, ids_slice * hop, seg_samples)

        # ---- D phase ----
        def d_loss_fn(d_params):
            # pair=True: both halves need param grads; one batched pass
            # is fastest (scripts/disc_pair_ab.py).
            logits_r, logits_g, _, _ = net_d.apply(
                {"params": d_params}, y_seg.astype(compute_dtype),
                jax.lax.stop_gradient(y_hat).astype(compute_dtype), pair=True)
            logits_r = [l.astype(jnp.float32) for l in logits_r]
            logits_g = [l.astype(jnp.float32) for l in logits_g]
            loss, r_losses, g_losses = discriminator_loss(logits_r, logits_g)
            return loss, (r_losses, g_losses)

        (loss_disc, (losses_d_r, losses_d_g)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        if grad_reduce is not None:
            d_grads = grad_reduce(d_grads)
        if scalar_reduce is not None:
            # Reduce BEFORE the guard: the skip decision must be identical on
            # every shard or the replicated states would diverge.
            loss_disc, losses_d_r, losses_d_g = scalar_reduce(
                (loss_disc, losses_d_r, losses_d_g))
        d_updates, d_opt = opt.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        if guard:
            # GradScaler-parity step skip (reference train.py:133-137): a
            # non-finite D grad/loss leaves params AND optimizer moments
            # untouched. Loss finiteness is checked too: JAX's |x| JVP is
            # select-based, so a NaN primal can yield finite-but-meaningless
            # grads (torch propagates the NaN and GradScaler skips).
            d_ok = _finite_flag(d_grads, loss_disc, loss_max=guard_loss_max,
                                check_tree=guard_grads)
            d_params = _select_state(d_ok, d_params, state.d_params)
            d_opt = _select_state(d_ok, d_opt, state.d_opt)

        # ---- G phase (against the updated D) ----
        # Loss as a function of the generator *outputs*; its cotangents are
        # pulled back through the saved forward residuals (g_vjp) — no
        # second generator forward.
        if split_prior:
            # Prior forward AFTER the D update in program order: no data
            # dependence on d_params, so at n>1 it is free to overlap the
            # D-phase gradient all-reduce.
            def p_fwd_fn(g_params):
                m_p, logs_p = net_g.apply(
                    {"params": g_params}, unit.astype(compute_dtype),
                    rngs={"sample": rng_prior}, method="prior_stats")
                return (m_p.astype(jnp.float32), logs_p.astype(jnp.float32))

            prior_out, p_vjp = jax.vjp(p_fwd_fn, state.g_params)

        def g_loss_fn(outs):
            if split_prior:
                (y_hat2, y_hat_mb2, (z, z_p, m_q, logs_q)), \
                    (m_p, logs_p) = outs
            else:
                y_hat2, y_hat_mb2, latents2 = outs
                z, z_p, m_p, logs_p, m_q, logs_q = latents2
            # pair=False: only the fake half is differentiated here; a
            # batched pass would pull cotangents through the real half too
            # (+8 ms, scripts/disc_pair_ab.py).
            logits_r, logits_g, fmap_r, fmap_g = net_d.apply(
                {"params": d_params}, y_seg.astype(compute_dtype),
                y_hat2.astype(compute_dtype), pair=False)
            logits_g = [l.astype(jnp.float32) for l in logits_g]

            # matmul-DFT path: differentiable and ~25% faster than the
            # fft path on TPU (scripts/mel_bench.py)
            y_hat_mel = wave_to_mel(y_hat2[..., 0], mel_basis,
                                    cfg.data.filter_length, hop,
                                    cfg.data.win_length, method="matmul")
            y_mel = slice_segments(mel, ids_slice, seg_frames)
            loss_mel = cfg.train.c_mel * jnp.mean(jnp.abs(y_mel - y_hat_mel))
            loss_kl = cfg.train.c_kl * kl_loss(z_p, logs_q, m_p, logs_p)
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_gen, gen_losses = generator_loss(logits_g)
            if use_subband_loss:
                y_mb = pqmf.analysis(y_seg)
                loss_sub = subband_stft_loss(
                    y_mb, y_hat_mb2,
                    cfg.train.fft_sizes, cfg.train.hop_sizes, cfg.train.win_lengths)
            else:
                loss_sub = jnp.zeros(())
            total = loss_gen + loss_fm + loss_mel + loss_kl + loss_sub
            aux = {"loss/g/total": total, "loss/g/gen": loss_gen, "loss/g/fm": loss_fm,
                   "loss/g/mel": loss_mel, "loss/g/kl": loss_kl, "loss/g/subband": loss_sub,
                   # reference train.py:172 logs per-discriminator generator
                   # losses as loss/g/{i}; the Summarizer expands the vector
                   "loss/g": jnp.stack(gen_losses),
                   # reference train.py:174-178 logs mel images of the
                   # training slice every log step; the 32x80 first-item
                   # slices ride the metrics dict (fetched only on log
                   # steps) so they cost no extra compute
                   "img/mel_gen": jax.lax.stop_gradient(y_hat_mel[0]),
                   "img/mel_org": jax.lax.stop_gradient(y_mel[0])}
            return total, aux

        if split_prior:
            (loss_g_total, g_aux), (og_q, og_p) = jax.value_and_grad(
                g_loss_fn, has_aux=True)(
                    ((y_hat, y_hat_mb, latents), prior_out))
            (g_grads_q,) = g_vjp(og_q)
            (g_grads_p,) = p_vjp(og_p)
            g_grads = jax.tree.map(jnp.add, g_grads_q, g_grads_p)
        else:
            (loss_g_total, g_aux), out_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)((y_hat, y_hat_mb, latents))
            (g_grads,) = g_vjp(out_grads)
        if grad_reduce is not None:
            g_grads = grad_reduce(g_grads)
        if scalar_reduce is not None:
            loss_g_total, g_aux = scalar_reduce((loss_g_total, g_aux))
        g_updates, g_opt = opt.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        if guard:
            g_ok = _finite_flag(g_grads, loss_g_total,
                                loss_max=guard_loss_max,
                                check_tree=guard_grads)
            g_params = _select_state(g_ok, g_params, state.g_params)
            g_opt = _select_state(g_ok, g_opt, state.g_opt)

        metrics = dict(g_aux)
        metrics["loss/d/total"] = loss_disc
        metrics["loss/d/r"] = losses_d_r
        metrics["loss/d/g"] = losses_d_g
        # reference train.py:176 "all/mel": the full (uncropped) target mel
        metrics["img/mel_all"] = mel[0]
        # gradient global-norms: one fused sum-of-squares pass per tree,
        # computed AFTER the cross-shard reduce so the scalars are already
        # replicated (beyond-reference observability)
        metrics["grad_norm/d"] = optax.global_norm(d_grads)
        metrics["grad_norm/g"] = optax.global_norm(g_grads)
        if guard:
            metrics["guard/d_skipped"] = 1.0 - d_ok.astype(jnp.float32)
            metrics["guard/g_skipped"] = 1.0 - g_ok.astype(jnp.float32)
        if scalar_reduce is not None:
            # Safety net for the explicit-collective path: every metric must
            # be cross-shard reduced or logging would show shard-local values.
            # The loss scalars above were already pmean'd (the guard needs
            # them reduced BEFORE the skip decision); pmean is idempotent on
            # replicated values, so re-reducing the assembled dict is free of
            # semantic risk and catches any future metric added here without
            # an explicit reduction.
            metrics = scalar_reduce(metrics)
        if debug_grads:
            # after scalar_reduce on purpose: grads were already reduced by
            # grad_reduce; a second pmean would be a no-op but wasteful.
            metrics["debug/d_grads"] = d_grads
            metrics["debug/g_grads"] = g_grads

        new_state = TrainState(step=state.step + 1, g_params=g_params,
                               d_params=d_params, g_opt=g_opt, d_opt=d_opt)
        return new_state, metrics

    return train_step
