"""Tensor-parallel contract at the scaled width where TP pays (VERDICT r4 #7).

BENCH.md "Tensor parallelism" derives the roofline: at reference width
(upsample_initial_channel=512, ~87M params) every layer fits one chip with
>100x headroom and DP strictly dominates. The documented config where the
knob becomes the right lever is ``configs/quickvc_tp.json`` —
``upsample_initial_channel: 4096`` (64x decoder conv weights; the decoder
alone passes ~3 GB f32 of parameters, past single-chip comfort for
params+grads+moments at b64 activations).

This script turns that argument into a validated contract on the 8-virtual-
device CPU mesh (model axis = 8, the TP layout a real v5e-8 slice would
use):

  1. layout analysis at the scaled width (eval_shape, no compute): total
     param bytes, per-device bytes under ``parallel/tp.py:param_shardings``,
     sharded fraction — the memory numbers the config promises;
  2. numerics: generator ``infer`` under the TP sharding == the replicated
     single-device run (GSPMD may only reorder reductions);
  3. comm model: per-boundary all-gather volume implied by the layout,
     reported per upsample stage.

Writes ``TP_CONTRACT_r{N}.json``. Run (CPU, ~10 min at the full width):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      nohup python scripts/tp_scaled_contract.py --round 5 > /tmp/tp_contract.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, required=True)
    parser.add_argument("--frames", type=int, default=32,
                        help="unit frames for init + the numerics check "
                             "(>= 32: the training init slices a 32-frame "
                             "decoder segment)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quickvc_tpu.config import load_config
    from quickvc_tpu.models.synthesizer import SynthesizerTrn
    from quickvc_tpu.parallel.tp import mesh_2d, param_shardings
    from quickvc_tpu.train.state import build_models

    assert jax.default_backend() == "cpu" and jax.device_count() >= 8, (
        "needs the 8-virtual-device CPU mesh (see module docstring)")
    t0 = time.time()
    cfg = load_config(os.path.join(REPO, "configs", "quickvc_tp.json"))
    assert cfg.model.upsample_initial_channel == 4096
    net_g, _ = build_models(cfg)
    f = args.frames
    k = jax.random.PRNGKey(0)
    unit = jnp.zeros((1, f, cfg.model.unit_channels))
    spec = jnp.zeros((1, f, cfg.spec_channels))
    mel = jnp.zeros((1, f, cfg.data.n_mel_channels))

    # --- 1. layout analysis (no compute) --------------------------------
    mesh = mesh_2d(data=1, model=8)
    abstract = jax.eval_shape(
        lambda: net_g.init({"params": k, "sample": k, "slice": k},
                           unit, spec, mel))["params"]
    shardings = param_shardings(mesh, abstract, min_channels=256)

    def nbytes(x):
        return int(np.prod(x.shape)) * x.dtype.itemsize

    total = sum(nbytes(l) for l in jax.tree.leaves(abstract))
    per_dev = 0
    sharded_bytes = 0
    for leaf, sh in zip(jax.tree.leaves(abstract), jax.tree.leaves(
            shardings, is_leaf=lambda s: isinstance(s, NamedSharding))):
        b = nbytes(leaf)
        if "model" in str(sh.spec):
            per_dev += b // 8
            sharded_bytes += b
        else:
            per_dev += b
    layout = {
        "total_param_bytes": total,
        "per_device_param_bytes": per_dev,
        "sharded_fraction": round(sharded_bytes / total, 4),
        "per_device_reduction": round(total / per_dev, 2),
    }
    print(f"layout: total {total/1e9:.2f} GB, per-device {per_dev/1e9:.3f} GB "
          f"({layout['per_device_reduction']}x reduction, "
          f"{layout['sharded_fraction']*100:.1f}% of bytes sharded)",
          flush=True)

    # --- 2. numerics: TP infer == replicated infer ----------------------
    params = jax.jit(lambda: net_g.init(
        {"params": k, "sample": k, "slice": k}, unit, spec, mel))()["params"]
    print(f"init done ({time.time()-t0:.0f} s)", flush=True)
    rng = np.random.default_rng(0)
    unit_x = jnp.asarray(rng.standard_normal((1, f, 256)).astype(np.float32))
    g_vec = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32) * 0.1)

    def infer(p, u, g):
        return net_g.apply({"params": p}, u, g, 0.0,
                           method=SynthesizerTrn.infer)

    golden = np.asarray(jax.jit(infer)(params, unit_x, g_vec))
    print(f"replicated forward done ({time.time()-t0:.0f} s)", flush=True)

    rep = NamedSharding(mesh, P())
    p_tp = jax.device_put(params, shardings)
    with mesh:
        ours = np.asarray(jax.jit(
            infer, in_shardings=(shardings, rep, rep),
            out_shardings=rep)(p_tp, unit_x, g_vec))
    print(f"TP forward done ({time.time()-t0:.0f} s)", flush=True)
    err = np.abs(ours - golden)
    scale = np.abs(golden).max()
    max_abs = float(err.max())
    ok = bool(max_abs <= 1e-5 + 1e-4 * scale)
    print(f"numerics: max_abs={max_abs:.3e} vs output scale {scale:.3e} "
          f"-> {'PASS' if ok else 'FAIL'}", flush=True)

    # --- 3. comm model ---------------------------------------------------
    # With output-channel sharding and replicated activations in, each
    # sharded conv produces activation shards that the next (replicated-
    # input) conv consumes via an all-gather of the activation tensor.
    hop_per_z = int(np.prod(cfg.model.upsample_rates))  # 20 samples/z-frame
    t1 = f * cfg.model.upsample_rates[0]
    t2 = f * hop_per_z
    ch = cfg.model.upsample_initial_channel
    comm = {
        "boundary_conv_pre_out": {"shape": [1, f, ch],
                                  "allgather_mb": round(f * ch * 4 / 2 ** 20, 2)},
        "boundary_up1_out": {"shape": [1, t1, ch // 2],
                             "allgather_mb": round(t1 * ch // 2 * 4 / 2 ** 20, 2)},
        "boundary_up2_out": {"shape": [1, t2, ch // 4],
                             "allgather_mb": round(t2 * ch // 4 * 4 / 2 ** 20, 2)},
        "note": "per batch item, f32; MRF resblocks add one gather per "
                "sharded conv pair unless GSPMD keeps them shard-local "
                "(output-dim then input-dim contraction)",
    }

    out = {
        "round": args.round,
        "config": "configs/quickvc_tp.json",
        "width": ch,
        "mesh": {"data": 1, "model": 8},
        "layout": layout,
        "numerics": {"frames": f, "max_abs_err": max_abs,
                     "output_scale": float(scale), "pass": ok},
        "comm_model": comm,
        "elapsed_s": round(time.time() - t0, 1),
    }
    path = os.path.join(REPO, f"TP_CONTRACT_r{args.round:02d}.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(f"wrote {path} ({out['elapsed_s']} s)", flush=True)
    # skip interpreter teardown: XLA CPU experimental collectives can abort
    # there (same reason as tests/test_train_step.py TP_SCRIPT)
    sys.stdout.flush()
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    sys.exit(main())
