"""Gradient differential vs the reference's torch autograd.

Forward parity tests (test_reference_parity.py) cannot see backward-only
bugs: weight-norm backward, the FM loss's detached real features, the
D-update-before-G-phase ordering, or AdamW parity. This test runs ONE full
training step on both sides with identical weights, data, posterior noise,
and slice ids, then compares:

- every loss term,
- the D-phase gradient pytree (reference train.py:123-137),
- the D params after the AdamW update (optimizer parity),
- the G-phase gradient pytree computed against the *updated* D
  (reference train.py:141-156),

leaf-for-leaf through the torch<->flax layout ports.

Randomness alignment: our step derives rngs by ``jax.random.split(rng)``
(train/step.py); we re-run the generator forward with the same rngs to
recover the posterior noise ``eps = (z - m_q)/exp(logs_q)`` and the slice
ids, then inject both into the reference via ``torch.randn_like`` and
``commons.rand_slice_segments`` monkeypatches. The reference's
``mel_processing`` is imported with a librosa shim that returns our
(independently implemented, same-formula) Slaney mel basis, so both sides
share one basis and the differential isolates model/loss/optimizer math.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from quickvc_tpu.config import DataConfig, ModelConfig, QuickVCConfig, TrainConfig
from quickvc_tpu.dsp.mel import mel_filterbank
from quickvc_tpu.dsp.stft import spec_to_mel
from quickvc_tpu.train import make_train_step
from quickvc_tpu.train.state import TrainState, build_models, make_optimizer
from quickvc_tpu.utils.torch_port import port_discriminator, port_generator, to_jax

from test_reference_parity import REF, SMALL_KW, ref_losses, ref_models  # noqa: F401

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_mel(ref_models):  # noqa: F811
    """Reference mel_processing, with librosa shimmed to our mel basis."""
    if "librosa" not in sys.modules:
        import importlib.machinery

        lib = types.ModuleType("librosa")
        filt = types.ModuleType("librosa.filters")
        # a real ModuleSpec: importlib.util.find_spec("librosa") (e.g.
        # transformers' availability probing) raises on __spec__=None
        lib.__spec__ = importlib.machinery.ModuleSpec("librosa", None)
        filt.__spec__ = importlib.machinery.ModuleSpec("librosa.filters", None)

        def mel(*, sr, n_fft, n_mels, fmin=0.0, fmax=None, **kw):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

        filt.mel = mel
        lib.filters = filt
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = filt
    sys.path.insert(0, REF)
    try:
        import mel_processing
    finally:
        sys.path.remove(REF)
    return mel_processing


def _grads_to_sd(net: torch.nn.Module) -> dict[str, np.ndarray]:
    return {k: p.grad.detach().numpy().copy()
            for k, p in net.named_parameters() if p.grad is not None}


def _zero_unused_res_half_g(tree):
    """port_generator fills the structurally-absent res half of each WN
    stack's LAST res_skip layer with g=1 (weight identity). For gradient
    trees the correct fill is 0 (our scanned stack computes-then-discards
    that half, so its grads are exactly zero)."""
    def walk(d):
        if isinstance(d, dict):
            if "layers" in d and isinstance(d.get("layers"), dict) \
                    and "res_skip" in d["layers"]:
                rs = d["layers"]["res_skip"]
                g = np.array(rs["g"])
                g[-1, : g.shape[1] // 2] = 0.0
                rs["g"] = g
            for v in d.values():
                walk(v)
    walk(tree)
    return tree


def _tree_max_rel_err(ours, golden) -> tuple[float, str]:
    """max over leaves of max|a-b| / (max|b| ∨ 1e-6), plus the argmax path."""
    worst, worst_path = 0.0, ""
    flat = jax.tree_util.tree_flatten_with_path(golden)[0]
    ours_leaves = jax.tree.leaves(ours)
    assert len(flat) == len(ours_leaves)
    for (path, b), a in zip(flat, ours_leaves):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert a.shape == b.shape, (jax.tree_util.keystr(path), a.shape, b.shape)
        err = float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-6))
        if err > worst:
            worst, worst_path = err, jax.tree_util.keystr(path)
    return worst, worst_path


def test_train_step_gradients_match_reference(ref_models, ref_losses, ref_mel):  # noqa: F811
    hop, f, b, seg_frames = 320, 40, 2, 8
    spec_ch = 641
    cfg = QuickVCConfig(
        train=TrainConfig(segment_size=seg_frames * hop, precision="f32",
                          batch_size=b, disc_width=1.0, guard_nonfinite=False),
        data=DataConfig(),
        model=ModelConfig(inter_channels=16, hidden_channels=16,
                          upsample_initial_channel=32, gin_channels=16,
                          resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3, 5),),
                          unit_channels=256),
    )

    # --- reference modules, shared weights ---
    torch.manual_seed(3)
    kw = dict(SMALL_KW)
    kw["ms_istft_vits"] = True
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref_g = ref_models.SynthesizerTrn(spec_ch, seg_frames, **kw).train()
    finally:
        torch.Tensor.cuda = orig_cuda
    ref_d = ref_models.MultiPeriodDiscriminator().train()

    sd_g = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()
            if "stft.window" not in k and "updown_filter" not in k
            and not k.startswith("dec.pqmf.")}
    g_params = to_jax(port_generator(sd_g, cfg.model))
    d_params = to_jax(port_discriminator(
        {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}))

    net_g, net_d = build_models(cfg)
    opt = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), g_params=g_params,
                       d_params=d_params, g_opt=opt.init(g_params),
                       d_opt=opt.init(d_params))

    # --- shared data (torch layout (B, C, T); ours channels-last) ---
    rng_np = np.random.default_rng(5)
    unit = (rng_np.standard_normal((b, 256, f)) * 0.3).astype(np.float32)
    spec = (np.abs(rng_np.standard_normal((b, spec_ch, f))) * 0.3
            + 0.01).astype(np.float32)
    y = np.clip(rng_np.standard_normal((b, 1, f * hop)) * 0.2,
                -0.99, 0.99).astype(np.float32)
    batch = {"unit": jnp.asarray(unit.transpose(0, 2, 1)),
             "spec": jnp.asarray(spec.transpose(0, 2, 1)),
             "wave": jnp.asarray(y[:, 0, :, None])}
    basis = jnp.asarray(mel_filterbank(16000, cfg.data.filter_length, 80))

    # --- our step (one jitted fn, debug grads on) ---
    rng = jax.random.PRNGKey(7)
    step = jax.jit(make_train_step(cfg, net_g, net_d, basis, debug_grads=True))
    state2, metrics = step(state, batch, rng)
    metrics = jax.device_get(metrics)

    # --- recover the randomness the step drew (same split, same rngs) ---
    rng_sample, rng_slice = jax.random.split(rng)
    mel_ours = spec_to_mel(batch["spec"], basis)
    fwd = jax.jit(lambda p, u, s, m: net_g.apply(
        {"params": p}, u, s, m, rngs={"sample": rng_sample, "slice": rng_slice}))
    _, _, ids, (z, _, _, _, m_q, logs_q) = fwd(state.g_params, batch["unit"],
                                               batch["spec"], mel_ours)
    eps_q = np.asarray((z - m_q) / jnp.exp(logs_q))       # (B, F, C)
    ids_np = np.asarray(ids)

    # --- reference step with injected noise/ids (train.py:117-162) ---
    c_t = torch.from_numpy(unit)
    spec_t = torch.from_numpy(spec)
    y_t = torch.from_numpy(y)
    mel_t = ref_mel.spec_to_mel(spec_t, cfg.data.filter_length, 80, 16000,
                                0.0, None)
    np.testing.assert_allclose(np.asarray(mel_ours).transpose(0, 2, 1),
                               mel_t.numpy(), atol=1e-5, rtol=1e-5)

    randn_calls = []

    def fake_randn_like(x, **kwargs):
        randn_calls.append(tuple(x.shape))
        if len(randn_calls) == 1:      # enc_p's sample — unused in training
            return torch.zeros_like(x)
        return torch.from_numpy(eps_q.transpose(0, 2, 1)).to(x.dtype)

    ref_commons = sys.modules["commons"]
    ids_t = torch.from_numpy(ids_np).long()
    orig_randn, orig_rand_slice = torch.randn_like, ref_commons.rand_slice_segments
    torch.randn_like = fake_randn_like
    ref_commons.rand_slice_segments = lambda series, seg: (
        ref_commons.slice_segments(series, ids_t, seg), ids_t)
    try:
        y_hat, y_hat_mb, ids_slice_t, (z_t, z_p_t, m_p_t, logs_p_t, m_q_t,
                                       logs_q_t) = ref_g(c_t, spec_t, mel_t)
    finally:
        torch.randn_like = orig_randn
        ref_commons.rand_slice_segments = orig_rand_slice
    assert len(randn_calls) == 2 and np.array_equal(ids_slice_t.numpy(), ids_np)
    # sanity: identical posterior sample on both sides
    np.testing.assert_allclose(np.asarray(z).transpose(0, 2, 1),
                               z_t.detach().numpy(), atol=2e-5, rtol=1e-4)

    y_seg_t = ref_commons.slice_segments(y_t, ids_t * hop, cfg.train.segment_size)

    # D phase (train.py:128-137)
    lr = cfg.train.learning_rate
    optim_d = torch.optim.AdamW(ref_d.parameters(), lr=lr, betas=(0.8, 0.99),
                                eps=1e-9, weight_decay=0.01)
    y_d_hat_r, y_d_hat_g, _, _ = ref_d(y_seg_t, y_hat.detach())
    loss_disc, _, _ = ref_losses.discriminator_loss(y_d_hat_r, y_d_hat_g)
    optim_d.zero_grad()
    loss_disc.backward()
    d_grads_golden = port_discriminator(_grads_to_sd(ref_d))
    optim_d.step()

    # G phase against the UPDATED D (train.py:141-156)
    y_d_hat_r2, y_d_hat_g2, fmap_r, fmap_g = ref_d(y_seg_t, y_hat)
    y_hat_mel = ref_mel.wave_to_mel(y_hat.squeeze(1), cfg.data.filter_length,
                                    80, 16000, hop, cfg.data.win_length,
                                    0.0, None)
    y_mel = ref_commons.slice_segments(mel_t, ids_t, seg_frames)
    loss_mel = cfg.train.c_mel * torch.nn.functional.l1_loss(y_mel, y_hat_mel)
    loss_kl = cfg.train.c_kl * ref_losses.kl_loss(z_p_t, logs_q_t, m_p_t, logs_p_t)
    loss_fm = ref_losses.feature_loss(fmap_r, fmap_g)
    loss_gen, _ = ref_losses.generator_loss(y_d_hat_g2)
    loss_gen_all = loss_gen + loss_fm + loss_mel + loss_kl
    ref_g.zero_grad()
    loss_gen_all.backward()
    g_grads_golden = _zero_unused_res_half_g(
        port_generator(_grads_to_sd(ref_g), cfg.model))

    # --- compare: losses ---
    for key, golden in [("loss/d/total", loss_disc), ("loss/g/gen", loss_gen),
                        ("loss/g/fm", loss_fm), ("loss/g/mel", loss_mel),
                        ("loss/g/kl", loss_kl), ("loss/g/total", loss_gen_all)]:
        np.testing.assert_allclose(float(metrics[key]), golden.item(),
                                   rtol=2e-4, atol=1e-5, err_msg=key)

    # --- compare: D gradients (pre-update params on both sides) ---
    err, path = _tree_max_rel_err(metrics["debug/d_grads"], d_grads_golden)
    assert err < 2e-3, f"D grads diverge: rel {err} at {path}"

    # --- compare: the applied D update (AdamW parity) ---
    # At step 1 Adam's update is lr*(sign(g) + wd*theta): gradient elements at
    # the numerical-noise floor legitimately flip sign between the two
    # implementations (±2*lr swings), so compare updates only where the
    # golden gradient is well-determined (>=1% of the leaf max), and bound
    # the rest by the sign-flip envelope. A wrong lr/wd/eps/bias-correction
    # or decaying the wrong params would break the masked gate.
    lr = cfg.train.learning_rate
    d_after = port_discriminator(
        {k: v.detach().numpy() for k, v in ref_d.state_dict().items()})
    flat_gold = jax.tree_util.tree_flatten_with_path(d_after)[0]
    for (path, after_g), before, after_o, g in zip(
            flat_gold, jax.tree.leaves(d_params),
            jax.tree.leaves(state2.d_params),
            jax.tree.leaves(d_grads_golden)):
        upd_o = np.asarray(after_o, np.float64) - np.asarray(before, np.float64)
        upd_g = np.asarray(after_g, np.float64) - np.asarray(before, np.float64)
        diff = np.abs(upd_o - upd_g)
        g = np.abs(np.asarray(g, np.float64))
        mask = g >= 0.01 * g.max()
        name = jax.tree_util.keystr(path)
        assert diff[mask].max() < 1e-2 * lr, \
            f"D update diverges on well-determined grads at {name}: " \
            f"{diff[mask].max()} vs lr {lr}"
        assert diff.max() < 2.1 * lr, \
            f"D update exceeds the sign-flip envelope at {name}: {diff.max()}"

    # --- compare: G gradients (through the updated D) ---
    err, path = _tree_max_rel_err(metrics["debug/g_grads"], g_grads_golden)
    assert err < 2e-3, f"G grads diverge: rel {err} at {path}"
