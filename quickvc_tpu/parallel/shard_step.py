"""Explicit-collective data-parallel train step (jax.shard_map).

The default training path is GSPMD: ``make_train_step`` is
sharding-agnostic, the loop jits it under NamedShardings, and XLA inserts
the f32 gradient ``psum`` over ICI automatically (train/loop.py). That
reduction moves 348 MB per step at full size and is the only multi-chip
communication in the step (BENCH.md "DP weak-scaling").

This wrapper re-expresses the SAME step with explicit collectives so the
all-reduce dtype becomes a knob: ``reduce_dtype=jnp.bfloat16`` halves the
ICI bytes (~+3 points of weak-scaling efficiency at n=8 per the BENCH.md
ring model) while the local backward AND the optimizer still run f32 —
only the cross-shard mean is rounded. Enable via config
``train.grad_reduce_dtype: "bf16"`` (train/loop.py picks this wrapper over
the GSPMD jit when the value is not "f32").

Semantics vs the GSPMD step:

- gradients: ``pmean`` over the data axis of shard-local batch-mean grads
  == the global batch-mean gradient (exact in f32 up to summation order).
- loss scalars / metrics: ``pmean``'d inside the step (hooks in
  train/step.py), so the non-finite guard's skip decision and every logged
  value are the global-batch quantities, identical on all shards — the
  replicated param/optimizer states cannot diverge.
- model randomness (posterior noise, slice ids): each shard folds its
  ``axis_index`` into the step rng, so draws are independent across shards.
  GSPMD draws them over the global batch from one key; either way every
  batch row sees an independent draw — the bit streams differ, the
  distribution does not. ``per_shard_rng=False`` gives every shard the
  same key (test use: with identical per-shard data the sharded step then
  reproduces the single-device step exactly).

The reference has no equivalent (its DDP stub never runs multi-GPU,
reference train.py:29-31); this is TPU-native scaling machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from quickvc_tpu.train.step import make_train_step


def make_sharded_train_step(cfg, net_g, net_d, mel_basis, mesh: Mesh,
                            axis: str = "data",
                            reduce_dtype=jnp.float32,
                            per_shard_rng: bool = True,
                            debug_grads: bool = False):
    """(state, batch, rng) -> (state, metrics), explicit-psum data parallel.

    ``state``/``rng`` replicated, ``batch`` leading-dim sharded over
    ``axis`` — the same calling convention as the GSPMD step, so the loop
    can swap between them freely.
    """

    def grad_reduce(tree):
        def red(g):
            if g.dtype != reduce_dtype:
                return jax.lax.pmean(g.astype(reduce_dtype),
                                     axis).astype(g.dtype)
            return jax.lax.pmean(g, axis)
        return jax.tree.map(red, tree)

    def scalar_reduce(tree):
        return jax.tree.map(lambda x: jax.lax.pmean(x, axis), tree)

    local_step = make_train_step(cfg, net_g, net_d, mel_basis,
                                 debug_grads=debug_grads,
                                 grad_reduce=grad_reduce,
                                 scalar_reduce=scalar_reduce)

    def step(state, batch, rng):
        if per_shard_rng:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return local_step(state, batch, rng)

    # check_vma=False: outputs ARE replicated (grads/scalars are pmean'd
    # before any state update), but the static replication tracker cannot
    # prove it through fold_in(axis_index); the exactness test below the
    # hood is tests/test_train_step.py::TestShardMapStep.
    sharded = jax.shard_map(step, mesh=mesh,
                            in_specs=(P(), P(axis), P()),
                            out_specs=(P(), P()),
                            check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
