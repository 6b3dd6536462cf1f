"""Export generator params from a training checkpoint for serving.

Writes a single msgpack file (flax serialization) holding only the
generator parameters — the deployment artifact equivalent of the
reference's ``G_*.pth`` (utils.py:183-193), minus optimizer state.

    python scripts/export_params.py --model-dir logs/quickvc --out quickvc_g.msgpack
    python convert.py --ptfile quickvc_g.msgpack ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", default=None,
                        help="training dir containing config.json + checkpoints/")
    parser.add_argument("--out", default=None)
    parser.add_argument("--hubert-in", default=None,
                        help="torch HuBERT-soft checkpoint to convert")
    parser.add_argument("--hubert-out", default=None,
                        help="write HuBERT params as msgpack (torch-free serving)")
    args = parser.parse_args()

    import flax.serialization
    import jax

    from quickvc_tpu.config import load_config
    from quickvc_tpu.train.state import create_train_state
    from quickvc_tpu.utils.checkpoint import CheckpointManager

    if args.hubert_in:
        assert args.hubert_out, "--hubert-in requires --hubert-out"
        from convert import load_hubert_params
        h_vars = load_hubert_params(args.hubert_in)
        with open(args.hubert_out, "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(h_vars["params"])))
        print(f"exported HuBERT params to {args.hubert_out}")
        if not args.model_dir:
            return

    assert args.model_dir and args.out, "--model-dir and --out required"
    cfg = load_config(os.path.join(args.model_dir, "config.json"))
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.model_dir)
    restored = mgr.restore_latest(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.model_dir}/checkpoints")
    state, step = restored
    with open(args.out, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.g_params)))
    print(f"exported step-{step} generator params to {args.out}")


if __name__ == "__main__":
    main()
