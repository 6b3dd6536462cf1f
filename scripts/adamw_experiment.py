"""Experiment: what do the train step's AdamW updates really cost?

The step breakdown attributes 7.4 ms to the two optimizer updates
(BENCH.md) against a ~3 ms HBM floor (87M params x 7 f32 passes / 819
GB/s). This measures the optimizer IN ISOLATION but with honest dataflow:
the (params, opt_state) pair is threaded through the timing scan's carry
and every leaf of the result is consumed, so XLA can neither hoist nor
DCE any leaf's update. (Two earlier drafts of this script measured
0.5-0.7 ms — below the bandwidth floor — by perturbing only one leaf /
discarding the new state; kept here as a benchmarking cautionary tale.)

Variants, all on the REAL full-size G+D param trees:

1. current     — inject_hyperparams(adamw) for G and D (as train/step.py)
2. plain       — optax.adamw on the combined tree
3. handwritten — one tree_map doing m/v/p in a single pass per leaf

    nohup python scripts/adamw_experiment.py > /tmp/adamw_exp.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from quickvc_tpu.config import QuickVCConfig
from quickvc_tpu.train.state import build_models, make_optimizer

B1, B2, EPS, WD, LR = 0.8, 0.99, 1e-9, 0.01, 2e-4
ITERS = 50


def time_carried(step_fn, carry0, grads):
    """Time ITERS optimizer steps with state threaded through a scan carry.

    The grads are perturbed per-iteration by a scalar derived from the
    current params, chaining iterations; the final return consumes every
    leaf (sum of per-leaf means), so no leaf's update is dead code.
    """

    @jax.jit
    def loop(carry, gr):
        def body(carry, _):
            s = jnp.mean(jax.tree.leaves(carry[0])[0]) * 1e-12
            g2 = jax.tree.map(lambda g: g + s, gr)
            return step_fn(carry, g2), None

        carry, _ = jax.lax.scan(body, carry, None, length=ITERS)
        return sum(jnp.mean(l) for l in jax.tree.leaves(carry[0]))

    out = loop(carry0, grads)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        val = float(loop(carry0, grads))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(val)
    return best / ITERS * 1e3


def main():
    cfg = QuickVCConfig()
    net_g, net_d = build_models(cfg)
    print("initializing full-size params (jitted)...", file=sys.stderr)
    g_params = jax.jit(lambda: net_g.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "slice": jax.random.PRNGKey(2)},
        jnp.zeros((1, 40, 256), jnp.float32),
        jnp.zeros((1, 40, cfg.spec_channels), jnp.float32),
        jnp.zeros((1, 40, 80), jnp.float32)))()["params"]
    y = jnp.zeros((1, 10240, 1), jnp.float32)
    d_params = jax.jit(lambda: net_d.init(jax.random.PRNGKey(3), y, y))()["params"]

    both = {"g": g_params, "d": d_params}
    n_params = sum(x.size for x in jax.tree.leaves(both))
    n_leaves = len(jax.tree.leaves(both))
    floor_ms = n_params * 4 * 7 / 819e9 * 1e3
    print(f"{n_params/1e6:.1f}M params in {n_leaves} leaves; "
          f"HBM floor ~{floor_ms:.1f} ms", flush=True)
    grads = jax.tree.map(lambda x: x * 0.01 + 1e-4, both)

    # 1. current: inject_hyperparams, separate G/D (matches train/step.py)
    tx = make_optimizer(cfg)

    def cur_step(carry, gr):
        (g_p, d_p), (og, od) = carry
        gu, og = tx.update(gr["g"], og, g_p)
        du, od = tx.update(gr["d"], od, d_p)
        return ((optax.apply_updates(g_p, gu), optax.apply_updates(d_p, du)),
                (og, od))

    carry0 = ((g_params, d_params),
              (jax.jit(tx.init)(g_params), jax.jit(tx.init)(d_params)))
    print(f"current (inject, G+D)   : {time_carried(cur_step, carry0, grads):6.2f} ms",
          flush=True)

    # 2. plain optax.adamw on the combined tree
    tx2 = optax.adamw(LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD)

    def plain_step(carry, gr):
        p, o = carry
        u, o = tx2.update(gr, o, p)
        return optax.apply_updates(p, u), o

    print(f"plain adamw (combined)  : "
          f"{time_carried(plain_step, (both, jax.jit(tx2.init)(both)), grads):6.2f} ms",
          flush=True)

    # 3. handwritten single-pass tree_map (fixed bias correction: the point
    # is the memory traffic, not the step count)
    def hand_step(carry, gr):
        p, (m, v) = carry
        c1 = 1.0 / (1 - B1)
        c2 = 1.0 / (1 - B2)

        def upd(p, m, v, g):
            m = B1 * m + (1 - B1) * g
            v = B2 * v + (1 - B2) * g * g
            return (p - LR * (m * c1 / (jnp.sqrt(v * c2) + EPS) + WD * p), m, v)

        out = jax.tree.map(lambda *a: upd(*a), p, m, v, gr)
        new_p = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return new_p, (new_m, new_v)

    m0 = jax.tree.map(jnp.zeros_like, both)
    v0 = jax.tree.map(jnp.zeros_like, both)
    print(f"handwritten tree_map    : "
          f"{time_carried(hand_step, (both, (m0, v0)), grads):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
