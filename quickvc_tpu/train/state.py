"""Train state: one pytree holding G/D params, both optimizers, and the step.

Reference equivalents: the (net_g, net_d, optim_g, optim_d, global_step)
quintuple of reference train.py:57-75, checkpointed as two separate torch
dicts (utils.py:147-193). Here it is a single flax struct — one orbax
checkpoint, one donate-able carry for the jitted step.

Optimizer: AdamW(lr=2e-4, betas=(0.8, 0.99), eps=1e-9) matching reference
configs/quickvc.json:7-9 (torch AdamW default weight_decay 0.01). The
per-epoch exponential LR decay (reference train.py:71-72, gamma=0.999875)
is injected via ``optax.inject_hyperparams`` so the loop can set the rate
without recompiling the step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from quickvc_tpu.config import QuickVCConfig
from quickvc_tpu.models.discriminators import MultiPeriodDiscriminator
from quickvc_tpu.models.synthesizer import SynthesizerTrn


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any


def make_optimizer(cfg: QuickVCConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.train.learning_rate,
        b1=cfg.train.betas[0],
        b2=cfg.train.betas[1],
        eps=cfg.train.eps,
        weight_decay=0.01,
    )


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in place (per-epoch decay)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def build_models(cfg: QuickVCConfig):
    net_g = SynthesizerTrn(cfg.spec_channels, cfg.segment_frames, cfg.model)
    net_d = MultiPeriodDiscriminator(width=cfg.train.disc_width)
    return net_g, net_d


def create_train_state(cfg: QuickVCConfig, rng: jax.Array,
                       example_frames: int = 32) -> tuple[TrainState, Any, Any]:
    """Initialize params + optimizers. Returns (state, net_g, net_d)."""
    net_g, net_d = build_models(cfg)
    f = example_frames
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    unit = jnp.zeros((1, f, cfg.model.unit_channels))
    spec = jnp.zeros((1, f, cfg.spec_channels))
    mel = jnp.zeros((1, f, cfg.data.n_mel_channels))
    # jit the inits: eager init dispatches thousands of host ops (slow on CPU)
    g_vars = jax.jit(lambda: net_g.init(
        {"params": k1, "sample": k2, "slice": k3}, unit, spec, mel))()
    wave = jnp.zeros((1, cfg.train.segment_size, 1))
    d_vars = jax.jit(lambda: net_d.init(k4, wave, wave))()
    opt = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        g_opt=opt.init(g_vars["params"]),
        d_opt=opt.init(d_vars["params"]),
    )
    return state, net_g, net_d


def _check_tree_compat(ours, ported, name: str) -> None:
    """Fail loudly (with a diff) when a ported tree doesn't match ours."""
    ref = jax.tree.structure(ours)
    got = jax.tree.structure(ported)
    if ref != got:
        ours_paths = {jax.tree_util.keystr(p) for p, _ in
                      jax.tree_util.tree_flatten_with_path(ours)[0]}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(ported)[0]}
        raise ValueError(
            f"ported {name} params don't match the model structure; "
            f"missing={sorted(ours_paths - got_paths)} "
            f"unexpected={sorted(got_paths - ours_paths)}")
    bad = [(jax.tree_util.keystr(p), tuple(b.shape), tuple(a.shape))
           for (p, a), b in zip(jax.tree_util.tree_flatten_with_path(ours)[0],
                                jax.tree.leaves(ported))
           if tuple(a.shape) != tuple(b.shape)]
    if bad:
        msg = ", ".join(f"{k}: got {g} want {w}" for k, g, w in bad[:8])
        raise ValueError(f"ported {name} param shape mismatch "
                         f"(wrong config for this checkpoint?): {msg}")


def warm_start_from_torch(state: TrainState, cfg: QuickVCConfig, g_path: str,
                          d_path: str | None = None) -> tuple[TrainState, int]:
    """Initialize G (and optionally D) params from reference ``.pth`` files.

    This is the fine-tuning entry point of the reference workflow: its
    train.py:61-68 resumes from the newest ``G_*.pth``/``D_*.pth`` in the
    model dir, and the official Colab (quickvc.ipynb) fine-tunes from the
    shipped ``G_1200000.pth``/``D_1200000.pth``. Optimizer states start
    fresh (torch AdamW moments are not portable into optax; the reference
    itself falls back to fresh optimizers on schema mismatch via its bare
    try/except). The step counter resumes from the checkpoint's iteration.
    """
    from quickvc_tpu.utils import torch_port

    sd_g, iteration, _ = torch_port.load_reference_checkpoint(g_path)
    g_params = torch_port.to_jax(torch_port.port_generator(sd_g, cfg.model))
    _check_tree_compat(state.g_params, g_params, "generator")
    d_params = state.d_params
    if d_path is not None:
        sd_d, _, _ = torch_port.load_reference_checkpoint(d_path)
        d_params = torch_port.to_jax(torch_port.port_discriminator(sd_d))
        _check_tree_compat(state.d_params, d_params, "discriminator")
    opt = make_optimizer(cfg)
    new_state = TrainState(
        step=jnp.asarray(iteration, jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=opt.init(g_params),
        d_opt=opt.init(d_params),
    )
    return new_state, iteration


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) if hasattr(p, "shape") else 0
               for p in jax.tree.leaves(params))
