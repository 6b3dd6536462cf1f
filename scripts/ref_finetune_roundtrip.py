"""TPU-trained checkpoint re-enters the REFERENCE ecosystem for fine-tuning.

VERDICT r4 item 5: prove a checkpoint trained by quickvc_tpu can continue
training under the reference's own unmodified train.py — the official
fine-tune workflow (reference quickvc.ipynb warm-starts from
G_1200000.pth/D_1200000.pth via train.py:61-68).

What this does, end to end (CPU, under the same shims as the convert
differential — tests/ref_convert_harness.py):

  1. restore our orbax train state (params + AdamW moments) from a real
     training run's model_dir;
  2. export reference-layout ``G_*.pth``/``D_*.pth`` INCLUDING torch
     ``AdamW.state_dict()`` optimizer state built from our optax moments
     (utils/torch_export.py:export_adamw_state) — without it the
     reference's restore raises on ``optimizer: None`` and its bare
     ``except`` silently falls back to scratch (train.py:61-68,
     utils.py:157-158);
  3. run the reference's UNMODIFIED train.py for one epoch on those files
     (librosa/torchaudio/cuda shims; NCCL swapped for gloo at world
     size 1 — the reference's own group does no collective work);
  4. assert the warm start actually happened (wrapped utils.load_checkpoint
     records both G and D restores at our iteration), training losses are
     finite, and the reference wrote its own next G_*/D_*.pth;
  5. close the loop: port the reference-written checkpoint BACK into a
     quickvc_tpu train state (train/state.py:warm_start_from_torch).

Writes ``REF_FINETUNE_r{N}.json``. Run:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/ref_finetune_roundtrip.py --round 5 \
        --model-dir /tmp/qvc_corpus/logs/durability \
        --files /tmp/qvc_corpus/train_prod.txt --n-files 4
"""

from __future__ import annotations

import argparse
import json
import os
import runpy
import shutil
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF = "/root/reference"


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, required=True)
    parser.add_argument("--model-dir", required=True,
                        help="quickvc_tpu run dir (orbax checkpoints/ inside)")
    parser.add_argument("--files", required=True,
                        help="filelist of 16k wavs with .npy units beside them")
    parser.add_argument("--n-files", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--workdir", default="/tmp/qvc_ref_finetune")
    parser.add_argument("--iteration", type=int, default=2,
                        help="reference epoch counter to stamp (its resume "
                             "semantics are epoch-based; the true step is "
                             "recorded in the JSON artifact)")
    args = parser.parse_args()

    import torch

    import jax

    assert jax.default_backend() == "cpu", "run under JAX_PLATFORMS=cpu"

    from ref_convert_harness import install_static_shims
    from quickvc_tpu.config import load_config
    from quickvc_tpu.train.state import create_train_state, warm_start_from_torch
    from quickvc_tpu.utils.checkpoint import CheckpointManager
    from quickvc_tpu.utils.compile_cache import enable_persistent_cache
    from quickvc_tpu.utils.torch_export import (
        adam_moment_trees,
        export_adamw_state,
        export_discriminator,
        export_generator,
        save_reference_checkpoint,
    )

    enable_persistent_cache()
    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)

    # --- 1. restore our trained state -----------------------------------
    cfg = load_config(os.path.join(args.model_dir, "config.json"))
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    restored = CheckpointManager(args.model_dir).restore_latest(state)
    assert restored is not None, f"no orbax checkpoint under {args.model_dir}"
    state, trained_step = restored
    print(f"restored step {trained_step} from {args.model_dir}", flush=True)

    g_sd = export_generator(jax.device_get(state.g_params), cfg.model)
    d_sd = export_discriminator(jax.device_get(state.d_params))
    g_mu, g_nu, g_count = adam_moment_trees(jax.device_get(state.g_opt))
    d_mu, d_nu, d_count = adam_moment_trees(jax.device_get(state.d_opt))
    g_mu_sd = export_generator(g_mu, cfg.model)
    g_nu_sd = export_generator(g_nu, cfg.model)
    d_mu_sd = export_discriminator(d_mu)
    d_nu_sd = export_discriminator(d_nu)

    # --- 2. reference models give the authoritative param order ---------
    install_static_shims()
    # data_utils_new_new.py imports speechcorpusy at module top (used only
    # for its corpus-preset mode; our runs use txt filelists) — stub it
    import types

    if "speechcorpusy" not in sys.modules:
        scy = types.ModuleType("speechcorpusy")

        def _no_preset(*a, **k):
            raise RuntimeError("speechcorpusy preset mode not available")

        scy.load_preset = _no_preset
        scy.__spec__ = __import__("importlib").machinery.ModuleSpec(
            "speechcorpusy", None)
        sys.modules["speechcorpusy"] = scy
    orig_tensor_cuda, orig_module_cuda = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    orig_ipg = torch.distributed.init_process_group
    torch.distributed.init_process_group = (
        lambda backend=None, **kw: orig_ipg(backend="gloo", **kw))
    sys.path.insert(0, REF)
    import models as ref_models  # noqa: E402  (the reference's models.py)
    import utils as ref_utils  # noqa: E402

    net_g_ref = ref_models.SynthesizerTrn(
        cfg.spec_channels, cfg.segment_frames, **cfg.to_dict()["model"])
    net_d_ref = ref_models.MultiPeriodDiscriminator()
    g_names = [n for n, _ in net_g_ref.named_parameters()]
    d_names = [n for n, _ in net_d_ref.named_parameters()]
    assert set(g_names) == set(g_sd), (
        sorted(set(g_names) ^ set(g_sd))[:8])
    assert set(d_names) == set(d_sd), (
        sorted(set(d_names) ^ set(d_sd))[:8])
    for n, p in net_g_ref.named_parameters():
        assert tuple(g_sd[n].shape) == tuple(p.shape), (n, g_sd[n].shape, p.shape)

    opt_g_sd = export_adamw_state(g_names, g_mu_sd, g_nu_sd, g_count,
                                  cfg.train.learning_rate, cfg.train.betas,
                                  cfg.train.eps)
    opt_d_sd = export_adamw_state(d_names, d_mu_sd, d_nu_sd, d_count,
                                  cfg.train.learning_rate, cfg.train.betas,
                                  cfg.train.eps)

    ref_dir = os.path.join(wd, "logs", "ref_finetune")
    os.makedirs(ref_dir, exist_ok=True)
    it = args.iteration
    save_reference_checkpoint(os.path.join(ref_dir, f"G_{it}.pth"), g_sd,
                              it, cfg.train.learning_rate, opt_g_sd)
    save_reference_checkpoint(os.path.join(ref_dir, f"D_{it}.pth"), d_sd,
                              it, cfg.train.learning_rate, opt_d_sd)
    print(f"wrote finetune-ready G_{it}.pth/D_{it}.pth (with AdamW state)",
          flush=True)

    # --- 3. data subset + reference config ------------------------------
    paths = [ln.strip() for ln in open(args.files) if ln.strip()]
    train_files = paths[: args.n_files]
    eval_files = paths[args.n_files : args.n_files + 2]
    assert len(train_files) == args.n_files and eval_files
    # copy wav+npy so the reference's .spec.pt cache writes stay in workdir
    def stage(lst, name):
        out = []
        for p in lst:
            base = os.path.join(wd, name + "_" + os.path.basename(p))
            shutil.copy(p, base)
            npy = os.path.splitext(p)[0] + ".npy"
            shutil.copy(npy, os.path.splitext(base)[0] + ".npy")
            out.append(base)
        lp = os.path.join(wd, f"{name}.txt")
        with open(lp, "w") as f:
            f.writelines(x + "\n" for x in out)
        return lp

    train_list, eval_list = stage(train_files, "train"), stage(eval_files, "eval")
    d = load_config(os.path.join(args.model_dir, "config.json")).to_dict()
    d["train"].update({"log_interval": 1, "eval_interval": 1, "epochs": it,
                       "batch_size": args.batch_size, "fp16_run": False})
    d["data"].update({"training_files": train_list,
                      "validation_files": eval_list})
    cfg_path = os.path.join(wd, "ref_config.json")
    json.dump(d, open(cfg_path, "w"), indent=1)

    # the reference's plot_spectrogram_to_numpy calls the long-removed
    # FigureCanvasAgg.tostring_rgb (utils.py:253) — restore it on new
    # matplotlib so the reference's TB image logging works unmodified
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    if not hasattr(FigureCanvasAgg, "tostring_rgb"):
        FigureCanvasAgg.tostring_rgb = lambda self: np.asarray(
            self.buffer_rgba())[..., :3].tobytes()

    # --- 4. run the unmodified reference train.py ------------------------
    loads: list[tuple[str, int]] = []
    orig_load = ref_utils.load_checkpoint

    def recording_load(path, model, optimizer=None):
        out = orig_load(path, model, optimizer)
        loads.append((os.path.basename(path), int(out[3])))
        return out

    ref_utils.load_checkpoint = recording_load
    orig_argv = list(sys.argv)
    sys.argv = ["train.py", "-c", cfg_path, "-m", "ref_finetune", "-mr",
                os.path.join(wd, "logs")]
    try:
        runpy.run_path(f"{REF}/train.py", run_name="__main__")
    finally:
        sys.argv = orig_argv
        ref_utils.load_checkpoint = orig_load
        torch.Tensor.cuda = orig_tensor_cuda
        torch.nn.Module.cuda = orig_module_cuda
        torch.distributed.init_process_group = orig_ipg
    print(f"reference train.py completed; recorded loads: {loads}", flush=True)

    assert [x[0] for x in loads] == [f"G_{it}.pth", f"D_{it}.pth"], loads
    assert all(x[1] == it for x in loads), loads

    # losses from the reference's own train.log: lines like "[d, g, fm,
    # mel, kl, sub, global_step]"
    log = open(os.path.join(ref_dir, "train.log")).read()
    last = None
    for ln in log.splitlines():
        ln = ln.rstrip()
        if not (ln.endswith("]") and "[" in ln):
            continue
        try:
            vals = json.loads("[" + ln.split("[", 1)[1])
        except (ValueError, json.JSONDecodeError):
            continue
        if (isinstance(vals, list) and len(vals) >= 6
                and all(isinstance(v, (int, float)) for v in vals)):
            last = vals
    assert last is not None, log[-2000:]
    losses = last[:-1]
    assert all(np.isfinite(v) for v in losses), losses

    new_g = [f for f in os.listdir(ref_dir)
             if f.startswith("G_") and f != f"G_{it}.pth"]
    new_d = [f for f in os.listdir(ref_dir)
             if f.startswith("D_") and f != f"D_{it}.pth"]
    assert new_g and new_d, os.listdir(ref_dir)

    # --- 5. port the reference-written checkpoint back ------------------
    back_state, back_it = warm_start_from_torch(
        state, cfg, os.path.join(ref_dir, sorted(new_g)[-1]),
        os.path.join(ref_dir, sorted(new_d)[-1]))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(back_state.g_params))
    print(f"round trip: reference-written {sorted(new_g)[-1]} ported back "
          f"(iteration {back_it})", flush=True)

    out = {
        "round": args.round,
        "source_model_dir": args.model_dir,
        "source_trained_step": trained_step,
        "adamw_counts": {"g": g_count, "d": d_count},
        "reference_loads": loads,
        "reference_losses_last_step": {
            k: float(v) for k, v in zip(
                ("d", "g", "fm", "mel", "kl", "subband"), losses)},
        "reference_wrote": sorted(new_g) + sorted(new_d),
        "roundtrip_back_iteration": int(back_it),
        "ok": True,
    }
    path = os.path.join(REPO, f"REF_FINETUNE_r{args.round:02d}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
