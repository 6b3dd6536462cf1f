"""Export quickvc_tpu params as reference-layout PyTorch checkpoints.

The inverse of ``torch_port.py``: a generator / discriminator param pytree
trained here becomes a ``G_*.pth`` / ``D_*.pth`` state dict with the exact
key names and tensor layouts the reference produces (reference
utils.py:147-193 checkpoint schema; module layouts models.py:549-642,
models.py:418-504), so TPU-trained models drop straight into the reference
ecosystem (its convert.py, its checkpoint tooling, downstream forks).

Layout mappings (see torch_port.py for the forward direction):

- ours ``kernel/v (k, in, out)``  -> torch ``Conv1d.weight (out, in, k)``
- ours ``v (k, out, in)``         -> torch ``ConvTranspose1d.weight (in, out, k)``
- ours ``v (kh, kw, in, out)``    -> torch ``Conv2d.weight (out, in, kh, kw)``
- ours ``g (c,)``                 -> torch ``weight_g (c, 1, 1[, 1])``
- ours Dense ``kernel (in, out)`` -> torch ``Linear.weight (out, in)``
- LSTM weights/biases map 1:1 (same i,f,g,o gate order).
- Our uniformly 2h-wide scanned WaveNet stacks export the last layer's
  res_skip conv as the reference's h-wide (skip-only) conv — the res half
  is structurally unused there (reference modules.py:66; our port zero-fills
  it, torch_port.py:_wavenet).

Optimizer state IS exported (round 5): optax ``adamw`` and
``torch.optim.AdamW`` share the same update rule (bias-corrected first/
second moments, decoupled weight decay 0.01, identical bias-correction
step numbering), and the moment trees mirror the param tree — so
``export_generator``/``export_discriminator`` applied to the mu/nu trees
yields name->moment state dicts, and :func:`export_adamw_state` assembles
them into the ``torch.optim.AdamW.state_dict()`` schema. This matters
because the reference's resume path (reference train.py:61-68 ->
utils.py:157-158) calls ``optimizer.load_state_dict(ckpt['optimizer'])``
BEFORE restoring the model and falls back to scratch via its bare except
if that raises — a checkpoint with ``optimizer: None`` silently disables
the official fine-tune workflow (reference quickvc.ipynb).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, np.float32))


def _conv_w(v) -> np.ndarray:
    return _np(v).transpose(2, 1, 0)  # (k, in, out) -> (out, in, k)


def _wn_conv(dst: dict, prefix: str, p: Mapping[str, Any], *,
             g_rank: int = 3, transpose=None) -> None:
    v = _np(p["v"])
    dst[f"{prefix}.weight_v"] = (v.transpose(*transpose) if transpose
                                 else _conv_w(v))
    dst[f"{prefix}.weight_g"] = _np(p["g"]).reshape((-1,) + (1,) * (g_rank - 1))
    if "bias" in p:
        dst[f"{prefix}.bias"] = _np(p["bias"])


def _plain_conv(dst: dict, prefix: str, p: Mapping[str, Any]) -> None:
    dst[f"{prefix}.weight"] = _conv_w(p["kernel"])
    if "bias" in p:
        dst[f"{prefix}.bias"] = _np(p["bias"])


def _wavenet(dst: dict, prefix: str, p: Mapping[str, Any]) -> None:
    """Stacked scan params (leading layer axis) -> per-layer torch convs."""
    if "cond_layer" in p:
        _wn_conv(dst, f"{prefix}.cond_layer", p["cond_layer"])
    ins, rss = p["layers"]["in"], p["layers"]["res_skip"]
    n_layers = ins["v"].shape[0]
    h = ins["v"].shape[2]  # (L, k, in=h, out=2h)
    for i in range(n_layers):
        _wn_conv(dst, f"{prefix}.in_layers.{i}",
                 {k: ins[k][i] for k in ins})
        r = {k: rss[k][i] for k in rss}
        if i == n_layers - 1:  # reference's last layer is h-wide (skip only)
            r = {"v": r["v"][..., h:], "g": r["g"][h:], "bias": r["bias"][h:]}
        _wn_conv(dst, f"{prefix}.res_skip_layers.{i}", r)


def _cond_normal(dst: dict, prefix: str, p: Mapping[str, Any]) -> None:
    _plain_conv(dst, f"{prefix}.pre", p["pre"])
    _wavenet(dst, f"{prefix}.enc", p["enc"])
    _plain_conv(dst, f"{prefix}.proj", p["proj"])


def export_generator(params: Mapping[str, Any], model_cfg) -> dict[str, np.ndarray]:
    """quickvc_tpu generator params -> reference SynthesizerTrn state dict."""
    sd: dict[str, np.ndarray] = {}
    _cond_normal(sd, "enc_q", params["enc_q"])
    _cond_normal(sd, "enc_p", params["enc_p"])

    n_flows = getattr(model_cfg, "n_flows", 4)
    for i in range(n_flows):
        ours = params["flow"][f"flow_{i}"]
        tp = f"flow.flows.{2 * i}"  # torch interleaves couplings and Flips
        _plain_conv(sd, f"{tp}.pre", ours["pre"])
        _wavenet(sd, f"{tp}.enc", ours["enc"])
        _plain_conv(sd, f"{tp}.post", ours["post"])

    lstm = params["enc_spk"]["lstm"]
    for layer in range(3):
        for theirs, ours in (("weight_ih", "w_ih"), ("weight_hh", "w_hh"),
                             ("bias_ih", "b_ih"), ("bias_hh", "b_hh")):
            sd[f"enc_spk.lstm.{theirs}_l{layer}"] = _np(lstm[f"{ours}_l{layer}"])
    sd["enc_spk.linear.weight"] = _np(params["enc_spk"]["linear"]["kernel"]).T
    sd["enc_spk.linear.bias"] = _np(params["enc_spk"]["linear"]["bias"])

    dec = params["dec"]
    backbone = dec["backbone"]
    _wn_conv(sd, "dec.conv_pre", backbone["conv_pre"])
    _plain_conv(sd, "dec.cond", backbone["cond"])
    num_kernels = len(model_cfg.resblock_kernel_sizes)
    for i in range(len(model_cfg.upsample_rates)):
        # ConvTranspose: ours (k, out, in) -> torch (in, out, k)
        _wn_conv(sd, f"dec.ups.{i}", backbone[f"up_{i}"], transpose=(2, 1, 0))
        for j in range(num_kernels):
            rb = backbone[f"resblock_{i}_{j}"]
            rp = f"dec.resblocks.{i * num_kernels + j}"
            for m in range(3):
                _wn_conv(sd, f"{rp}.convs1.{m}", rb[f"conv1_{m}"])
                _wn_conv(sd, f"{rp}.convs2.{m}", rb[f"conv2_{m}"])

    if model_cfg.decoder_kind == "istft":
        _wn_conv(sd, "dec.conv_post", dec["conv_post"])
    else:
        _wn_conv(sd, "dec.subband_conv_post", dec["head"]["subband_conv_post"])
        if model_cfg.decoder_kind == "ms_istft":
            _wn_conv(sd, "dec.multistream_conv_post",
                     dec["multistream_conv_post"])
    return sd


def export_discriminator(params: Mapping[str, Any],
                         periods=(2, 3, 5, 7, 11)) -> dict[str, np.ndarray]:
    """quickvc_tpu MPD params -> reference MultiPeriodDiscriminator state dict."""
    sd: dict[str, np.ndarray] = {}
    s = params["disc_s"]
    for i in range(6):
        _wn_conv(sd, f"discriminators.0.convs.{i}", s[f"WNConv1d_{i}"])
    _wn_conv(sd, "discriminators.0.conv_post", s["WNConv1d_6"])
    for d, period in enumerate(periods, start=1):
        p = params[f"disc_p{period}"]
        for i in range(5):
            _wn_conv(sd, f"discriminators.{d}.convs.{i}", p[f"WNConv2d_{i}"],
                     g_rank=4, transpose=(3, 2, 0, 1))
        _wn_conv(sd, f"discriminators.{d}.conv_post", p["WNConv2d_5"],
                 g_rank=4, transpose=(3, 2, 0, 1))
    return sd


def adam_moment_trees(opt_state):
    """Pull the (mu, nu, count) out of our optimizer state.

    ``make_optimizer`` is ``inject_hyperparams(adamw)``; its inner chain
    carries exactly one ``ScaleByAdamState`` whose mu/nu trees mirror the
    param tree (same leaf names, so the structural exporters above apply
    to them unchanged).
    """
    import jax
    import optax

    adam = [s for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert len(adam) == 1, f"expected one ScaleByAdamState, got {len(adam)}"
    return adam[0].mu, adam[0].nu, int(adam[0].count)


def export_adamw_state(ordered_param_names, mu_sd: Mapping[str, np.ndarray],
                       nu_sd: Mapping[str, np.ndarray], count: int,
                       learning_rate: float, betas=(0.8, 0.99),
                       eps: float = 1e-9, weight_decay: float = 0.01,
                       initial_lr: float | None = None) -> dict:
    """Assemble a ``torch.optim.AdamW.state_dict()`` from exported moments.

    ``ordered_param_names`` is ``[n for n, _ in model.named_parameters()]``
    of the torch-side model (parameters only — buffers like PQMF filters
    are in the state dict but not in any param group); every name must
    exist in the moment dicts. ``count`` follows optax's convention
    (number of updates applied) which equals torch's ``step``.
    """
    import torch

    state, missing = {}, []
    for i, name in enumerate(ordered_param_names):
        if name not in mu_sd or name not in nu_sd:
            missing.append(name)
            continue
        state[i] = {
            "step": torch.tensor(float(count)),
            "exp_avg": torch.from_numpy(np.array(mu_sd[name], copy=True)),
            "exp_avg_sq": torch.from_numpy(np.array(nu_sd[name], copy=True)),
        }
    assert not missing, f"params without exported moments: {missing[:8]}"
    return {
        "state": state,
        "param_groups": [{
            "lr": float(learning_rate),
            # the reference resumes its ExponentialLR with last_epoch >= 0
            # (train.py:71), which requires the checkpointed optimizer to
            # carry the scheduler-stamped initial_lr
            "initial_lr": float(initial_lr if initial_lr is not None
                                else learning_rate),
            "betas": tuple(float(b) for b in betas),
            "eps": float(eps),
            "weight_decay": float(weight_decay),
            "amsgrad": False,
            "maximize": False,
            "foreach": None,
            "capturable": False,
            "differentiable": False,
            "fused": None,
            "params": list(range(len(ordered_param_names))),
        }],
    }


def save_reference_checkpoint(path: str, state_dict: Mapping[str, np.ndarray],
                              iteration: int, learning_rate: float,
                              optimizer_sd: dict | None = None) -> None:
    """Write a reference-schema ``.pth``: {model, iteration, optimizer, learning_rate}."""
    import torch

    torch.save({
        # copy: jax-backed arrays can be non-writable views, which
        # torch.from_numpy warns about (UB if the tensor were written)
        "model": {k: torch.from_numpy(np.array(v, copy=True))
                  for k, v in state_dict.items()},
        "iteration": int(iteration),
        "optimizer": optimizer_sd,  # AdamW schema (export_adamw_state) or None
        "learning_rate": float(learning_rate),
    }, path)
