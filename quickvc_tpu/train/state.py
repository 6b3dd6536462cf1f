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


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) if hasattr(p, "shape") else 0
               for p in jax.tree.leaves(params))
