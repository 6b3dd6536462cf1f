"""Full-size CLI differential: reference convert.py vs ours, all 12 pairs.

Runs the machinery of tests/test_convert_cli_differential.py at PRODUCTION
size over the reference's own ``convert.txt`` pairs and ``test_data/`` wavs:

1. seeded full-size generator  -> reference-layout ``G.pth`` (torch_export)
2. seeded full-size HuBERT-soft -> bshall-layout ``hubert-soft.pt``
3. ``/root/reference/convert.py`` (unmodified, under shims) on those files
4. our ``convert.py --noise-scale 0 --bucket-seconds 0 --batch 1``
5. per-pair waveform L1 + log-mel L1 -> JSON report; gate mel-L1 < 1e-3

This differentially validates the ENTIRE CLI pipeline (file parsing, host
load/trim/resample, mel + speaker windowing incl. the <128-frame branch,
94M HuBERT forward, full-width generator infer, wav write) against the
reference's code; only the literal pretrained weights remain untested
(no network). CPU-only: run with
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/convert_cli_differential.py [--limit N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF = "/root/reference"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/qvc_cli_diff")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--ptfile", default=None,
                        help="existing reference-layout G .pth (default: "
                             "export a seeded full-size generator)")
    parser.add_argument("--hubert", default=None,
                        help="existing bshall-layout HuBERT .pt (default: "
                             "seeded full-size random)")
    parser.add_argument("--out", default="convert_differential_report.json")
    args = parser.parse_args()
    wd = args.workdir
    os.makedirs(wd, exist_ok=True)

    import torch

    import jax

    from ref_convert_harness import (
        TorchHubertSoft,
        load_torch_hubert,
        run_reference_convert,
    )
    from test_convert_cli_differential import mel_l1
    from quickvc_tpu.config import load_config
    from quickvc_tpu.data.audio_io import read_wav
    from quickvc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg_path = os.path.join(wd, "config.json")
    cfg = load_config(os.path.join(REPO, "configs", "quickvc.json"))
    cfg.save(cfg_path)

    g_pth = args.ptfile or os.path.join(wd, "G_seeded.pth")
    if args.ptfile is None and not os.path.exists(g_pth):
        from quickvc_tpu.train.state import create_train_state
        from quickvc_tpu.utils.torch_export import (
            export_generator,
            save_reference_checkpoint,
        )

        print("exporting seeded full-size generator ->", g_pth)
        state, _, _ = create_train_state(cfg, jax.random.PRNGKey(11))
        save_reference_checkpoint(
            g_pth, export_generator(state.g_params, cfg.model), 1, 2e-4)

    hubert_pt = args.hubert or os.path.join(wd, "hubert-soft.pt")
    if args.hubert is None and not os.path.exists(hubert_pt):
        print("building seeded full-size HuBERT ->", hubert_pt)
        torch.manual_seed(5)
        h = TorchHubertSoft().eval()
        torch.save({"hubert": h.state_dict()}, hubert_pt)
    hubert_t = load_torch_hubert(hubert_pt)

    # absolute-path convert.txt (the reference's is repo-relative)
    pairs = []
    with open(os.path.join(REF, "convert.txt")) as f:
        for line in f:
            if line.strip():
                t, s, g = line.strip().split("|")
                pairs.append((t, os.path.join(REF, s), os.path.join(REF, g)))
    if args.limit:
        pairs = pairs[: args.limit]
    txt = os.path.join(wd, "convert.txt")
    with open(txt, "w") as f:
        for t, s, g in pairs:
            f.write(f"{t}|{s}|{g}\n")

    out_ref = os.path.join(wd, "out_ref")
    out_ours = os.path.join(wd, "out_ours")

    print(f"--- reference convert.py on {len(pairs)} pairs ---")
    run_reference_convert(cfg_path, g_pth, txt, out_ref, hubert_t)

    print("--- our convert.py, same weights ---")
    import convert as our_convert

    argv = sys.argv
    sys.argv = ["convert.py", "--hpfile", cfg_path, "--ptfile", g_pth,
                "--hubert", hubert_pt, "--txtpath", txt, "--outdir", out_ours,
                "--noise-scale", "0", "--bucket-seconds", "0", "--batch", "1"]
    try:
        our_convert.main()
    finally:
        sys.argv = argv

    report = []
    for title, _, _ in pairs:
        ref_wav, _ = read_wav(os.path.join(out_ref, f"{title}.wav"))
        our_wav, _ = read_wav(os.path.join(out_ours, f"{title}.wav"))
        n = min(len(ref_wav), len(our_wav))
        w_l1 = float(np.abs(ref_wav[:n] - our_wav[:n]).mean())
        m_l1 = mel_l1(ref_wav, our_wav, cfg)
        report.append({"title": title, "wave_l1": w_l1, "mel_l1": m_l1,
                       "len_ref": len(ref_wav), "len_ours": len(our_wav)})
        print(f"{title}: wave_l1={w_l1:.3e} mel_l1={m_l1:.3e} "
              f"len {len(ref_wav)}/{len(our_wav)}")

    summary = {
        "pairs": report,
        "mel_l1_mean": float(np.mean([r["mel_l1"] for r in report])),
        "mel_l1_max": float(np.max([r["mel_l1"] for r in report])),
        "wave_l1_max": float(np.max([r["wave_l1"] for r in report])),
        "gate_mel_l1_lt_1e-3": bool(all(r["mel_l1"] < 1e-3 for r in report)),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "pairs"}))


if __name__ == "__main__":
    main()
