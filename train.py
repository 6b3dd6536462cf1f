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
    parser.add_argument("--export-torch-every", type=int, default=None,
                        metavar="N",
                        help="also write reference-layout G_<step>.pth/"
                             "D_<step>.pth into model_dir every N steps "
                             "(reference train.py:181-186 torch checkpoints); "
                             "overrides train.export_torch_every from the "
                             "config")
    parser.add_argument("--init-from-torch", type=str, nargs="+", default=None,
                        metavar=("G.pth", "D.pth"),
                        help="warm-start from reference-layout torch "
                             "checkpoints (fine-tuning); without this flag "
                             "the newest G_*.pth/D_*.pth in model_dir are "
                             "picked up automatically when no orbax "
                             "checkpoint exists (reference train.py:61-68)")
    args = parser.parse_args()
    init_torch = None
    if args.init_from_torch:
        if len(args.init_from_torch) > 2:
            parser.error("--init-from-torch takes G.pth [D.pth]")
        init_torch = (args.init_from_torch[0],
                      args.init_from_torch[1] if len(args.init_from_torch) > 1
                      else None)

    if args.distributed:
        import jax
        jax.distributed.initialize()

    from quickvc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    cfg = get_config(args.config, args.model, args.modelroot)
    if args.export_torch_every is not None:
        cfg.train.export_torch_every = args.export_torch_every

    from quickvc_tpu.train.loop import run
    from quickvc_tpu.train.telemetry import RESTART_EXIT_CODE, HostMemoryRestart
    try:
        run(cfg, max_steps=args.max_steps, profile_steps=args.profile_steps,
            init_torch=init_torch)
    except HostMemoryRestart as e:
        # Checkpointed restart request (train.max_host_rss_gb): exit with
        # the supervisor-recognized code; scripts/supervise_train.py (or any
        # process manager) relaunches and the run resumes bit-exactly.
        print(f"restart requested: {e}", flush=True)
        raise SystemExit(RESTART_EXIT_CODE)


if __name__ == "__main__":
    main()
