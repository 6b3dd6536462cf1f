"""Generate the synthetic verification sandbox (see .claude/skills/verify).

Creates under --root (default /tmp/qvc_verify):
- raw/spk1/*.wav         mixed-rate inputs for downsample.py
- data/utt*.{wav,npy}    16 kHz training set with 256-dim units
- train.txt, small.json  filelist + shallow-model config
- hubert-soft.pt         full-size random HuBERT-soft torch checkpoint
- G_synthetic.pth        full-size random reference-layout G checkpoint
- convert.txt            conversion pairs over the synthetic data

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/make_verify_sandbox.py [--root /tmp/qvc_verify]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/qvc_verify")
    args = parser.parse_args()
    root = args.root

    from quickvc_tpu.data.audio_io import write_wav_int16

    rng = np.random.default_rng(7)
    os.makedirs(f"{root}/raw/spk1", exist_ok=True)
    for i, sr in enumerate([22050, 48000, 16000]):
        t = int(sr * 1.5)
        w = (0.4 * np.sin(2 * np.pi * 300 * (i + 1) * np.arange(t) / sr)
             + 0.02 * rng.standard_normal(t))
        w[: sr // 10] *= 0.001
        write_wav_int16(f"{root}/raw/spk1/utt{i}.wav", w.astype(np.float32), sr)

    os.makedirs(f"{root}/data", exist_ok=True)
    paths = []
    for i in range(4):
        t = 16000 + 4000 * i
        w = (0.3 * np.sin(2 * np.pi * 220 * (i + 1) * np.arange(t) / 16000)
             + 0.05 * rng.standard_normal(t)).astype(np.float32)
        p = f"{root}/data/utt{i}.wav"
        write_wav_int16(p, w, 16000)
        np.save(p.replace(".wav", ".npy"),
                rng.standard_normal((t // 320, 256)).astype(np.float32))
        paths.append(p)
    with open(f"{root}/train.txt", "w") as f:
        f.write("\n".join(paths) + "\n")

    cfg = json.load(open(os.path.join(REPO, "configs/quickvc.json")))
    cfg["train"].update({"batch_size": 2, "segment_size": 2560, "max_speclen": 32,
                         "precision": "f32", "disc_width": 0.25,
                         "eval_interval": 0, "log_interval": 1})
    cfg["data"].update({"training_files": f"{root}/train.txt",
                        "validation_files": f"{root}/train.txt"})
    cfg["model"].update({"inter_channels": 16, "hidden_channels": 16,
                         "upsample_initial_channel": 32, "gin_channels": 16,
                         "resblock_kernel_sizes": [3],
                         "resblock_dilation_sizes": [[1, 3, 5]],
                         "enc_wn_layers": 2, "flow_wn_layers": 2, "n_flows": 2})
    json.dump(cfg, open(f"{root}/small.json", "w"), indent=1)

    import torch
    from test_hubert import TorchHubertReplica
    from test_torch_port import synth_generator_sd
    from quickvc_tpu.config import ModelConfig

    h = TorchHubertReplica(d=768, layers=12, heads=12, ffn=3072, ch=512,
                           unit=256, pos_k=128, pos_g=16)
    torch.save({"hubert": h.state_dict()}, f"{root}/hubert-soft.pt")

    sd = synth_generator_sd(np.random.default_rng(3), ModelConfig(), 641)
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                "iteration": 1, "learning_rate": 2e-4, "optimizer": {}},
               f"{root}/G_synthetic.pth")

    with open(f"{root}/convert.txt", "w") as f:
        f.write(f"verify1|{root}/data/utt0.wav|{root}/data/utt1.wav\n")
        f.write(f"verify2|{root}/data/utt2.wav|{root}/data/utt3.wav\n")
    print(f"sandbox ready under {root}")


if __name__ == "__main__":
    main()
