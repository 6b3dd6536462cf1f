"""Export params from a training checkpoint for serving or interop.

Two formats:

- ``--format msgpack`` (default): flax serialization of the generator
  params — the deployment artifact equivalent of the reference's
  ``G_*.pth`` (utils.py:183-193), minus optimizer state.
- ``--format torch``: a reference-layout PyTorch checkpoint
  (utils/torch_export.py) loadable by the reference's own convert.py /
  train.py resume — TPU-trained models flow back into the reference
  ecosystem. ``--disc-out`` additionally writes the D_*.pth.

    python scripts/export_params.py --model-dir logs/quickvc --out quickvc_g.msgpack
    python scripts/export_params.py --model-dir logs/quickvc --format torch \
        --out G_export.pth --disc-out D_export.pth
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
    parser.add_argument("--format", choices=["msgpack", "torch"], default="msgpack")
    parser.add_argument("--disc-out", default=None,
                        help="with --format torch: also write the discriminator .pth")
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
    if args.format == "torch":
        from quickvc_tpu.utils.torch_export import (
            export_discriminator, export_generator, save_reference_checkpoint)
        # informational field in the reference schema (decay is per-epoch and
        # the epoch count isn't stored in our state; the base LR is closest)
        lr = cfg.train.learning_rate
        sd = export_generator(jax.device_get(state.g_params), cfg.model)
        save_reference_checkpoint(args.out, sd, step, lr)
        print(f"exported step-{step} generator to {args.out} (reference layout)")
        if args.disc_out:
            dsd = export_discriminator(jax.device_get(state.d_params))
            save_reference_checkpoint(args.disc_out, dsd, step, lr)
            print(f"exported step-{step} discriminator to {args.disc_out}")
        return
    with open(args.out, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state.g_params)))
    print(f"exported step-{step} generator params to {args.out}")


if __name__ == "__main__":
    main()
