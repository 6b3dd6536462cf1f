"""Train QuickVC-TPU.

CLI parity with the reference (utils.py:78-84):
    python train.py [-c configs/quickvc.json] [-m quickvc] [-mr ./logs]
"""

import argparse

from quickvc_tpu.config import get_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, default="./configs/quickvc.json")
    parser.add_argument("-m", "--model", type=str, default="quickvc")
    parser.add_argument("-mr", "--modelroot", type=str, default="./logs")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="stop after N steps (smoke runs)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: call jax.distributed.initialize() "
                             "(set JAX coordinator env vars per host)")
    parser.add_argument("--profile-steps", type=int, default=0,
                        help="capture an XLA trace of N steps into "
                             "model_dir/profile (view in TensorBoard)")
    args = parser.parse_args()

    if args.distributed:
        import jax
        jax.distributed.initialize()

    cfg = get_config(args.config, args.model, args.modelroot)

    from quickvc_tpu.train.loop import run
    run(cfg, max_steps=args.max_steps, profile_steps=args.profile_steps)


if __name__ == "__main__":
    main()
