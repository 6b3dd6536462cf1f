"""Prepare the full-size TPU overfit run on the reference test_data wavs.

VERDICT missing #2: prove the training step LEARNS at full model size on
real speech, not just on the synthetic CPU sandbox (tests/test_learning.py).
The reference's implicit evidence is its shipped 1.2M-step checkpoints
(reference README.md:49); ours is a few hundred TPU steps on the 19 wavs in
/root/reference/test_data with the loss / eval mel-L1 trajectory recorded in
BENCH.md.

Units: the real workflow derives 256-dim HuBERT-soft units offline
(dataset/encode.py); the pretrained HuBERT checkpoint is not available in
this environment, so units here are a fixed seeded linear projection of the
log-mel — deterministic and content-correlated, which exercises the same
prior/KL/flow learning problem (the prior must map units to the posterior;
content-correlated units make that mapping learnable, unlike pure noise).

Host-only prep (run under CPU env):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/overfit_prepare.py [--root /tmp/qvc_overfit]

Then train on the TPU (default env):

    python train.py -c /tmp/qvc_overfit/overfit.json -m overfit \
        -mr /tmp/qvc_overfit/logs --max-steps 401
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

REF_DATA = "/root/reference/test_data"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/qvc_overfit")
    parser.add_argument("--batch-size", type=int, default=8)
    args = parser.parse_args()
    root = args.root

    from quickvc_tpu.config import QuickVCConfig
    from quickvc_tpu.data.audio_io import (peak_normalize, read_audio,
                                           resample, trim_silence,
                                           write_wav_int16)
    from quickvc_tpu.data.dataset import _compute_spec
    from quickvc_tpu.dsp.mel import mel_filterbank

    os.makedirs(f"{root}/data", exist_ok=True)
    cfg = QuickVCConfig()
    basis = mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                           cfg.data.n_mel_channels)  # (80, 641)

    # Fixed projection: 80-dim log-mel -> 256-dim "units" (seeded, unit rows)
    rng = np.random.default_rng(0)
    proj = rng.standard_normal((cfg.data.n_mel_channels,
                                cfg.model.unit_channels)).astype(np.float32)
    proj /= np.linalg.norm(proj, axis=0, keepdims=True)

    paths, mels = [], []
    for src in sorted(glob.glob(f"{REF_DATA}/*.wav")):
        wav, sr = read_audio(src)
        wav, _ = trim_silence(wav, top_db=20)
        wav = peak_normalize(wav, 0.95)
        wav = resample(wav, sr, cfg.data.sampling_rate)
        out = f"{root}/data/{os.path.basename(src)}"
        write_wav_int16(out, wav, cfg.data.sampling_rate)
        # spec exactly as the training loader computes it -> unit frame
        # count matches the spec frame count per item
        wav16, _ = read_audio(out)  # round-trip through s16 like training
        spec = _compute_spec(wav16, cfg)  # (Frame, 641)
        mel = np.log(np.clip(spec @ basis.T, 1e-5, None))  # (Frame, 80)
        paths.append(out)
        mels.append(mel)

    # Standardize units over the corpus (HuBERT-soft units are roughly
    # zero-mean unit-scale per dim; the prior encoder expects that regime).
    units = [m @ proj for m in mels]
    cat = np.concatenate(units, axis=0)
    mu, sd = cat.mean(0), cat.std(0) + 1e-5
    for p, u in zip(paths, units):
        np.save(p.replace(".wav", ".npy"),
                ((u - mu) / sd).astype(np.float32))

    with open(f"{root}/train.txt", "w") as f:
        f.writelines(p + "\n" for p in paths)

    cfg_json = json.load(open(os.path.join(REPO, "configs/quickvc.json")))
    cfg_json["train"].update({
        "batch_size": args.batch_size,
        "log_interval": 10,
        "eval_interval": 100,
    })
    cfg_json["data"].update({
        "training_files": f"{root}/train.txt",
        "validation_files": f"{root}/train.txt",
    })
    json.dump(cfg_json, open(f"{root}/overfit.json", "w"), indent=1)
    print(f"prepared {len(paths)} wavs "
          f"({sum(len(m) for m in mels) * cfg.data.hop_length / 16000:.1f} s "
          f"audio) under {root}")


if __name__ == "__main__":
    main()
