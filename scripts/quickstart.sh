#!/usr/bin/env bash
# End-to-end pipeline, mirroring the reference's Colab driver (quickvc.ipynb):
# preprocess -> unit-encode -> train -> convert. Adjust paths to your corpus.
set -euo pipefail

CORPUS=${1:?usage: quickstart.sh <corpus-dir (e.g. VCTK wav48_silence_trimmed)> [workdir]}
WORK=${2:-./work}
HUBERT=${HUBERT:-logs/hubert-soft.pt}   # local bshall/hubert HuBERT-soft ckpt

mkdir -p "$WORK"

# 0. native decoder (needed once, for FLAC corpora like VCTK mic2)
make -C native

# 1. trim + peak-normalize + resample to 16 kHz s16
python downsample.py --in-dir "$CORPUS" --out-dir "$WORK/wav16k" --extension .flac

# 2. HuBERT-soft units beside the wavs
python dataset/encode.py soft "$WORK/wav16k" "$WORK/wav16k" --hubert "$HUBERT"

# 3. train (directory-corpus mode: per-speaker last utterance -> eval split)
python - <<PY
import json
cfg = json.load(open("configs/quickvc.json"))
cfg["data"]["training_files"] = "$WORK/wav16k"
cfg["data"]["validation_files"] = "$WORK/wav16k"
json.dump(cfg, open("$WORK/config.json", "w"), indent=2)
PY
python train.py -c "$WORK/config.json" -m quickvc -mr "$WORK/logs"

# 4. convert (after training; or point --ptfile at the reference quickvc.pth)
python convert.py --hpfile "$WORK/logs/quickvc/config.json" \
    --ptfile "$WORK/logs/quickvc" --hubert "$HUBERT" \
    --txtpath convert.txt --outdir "$WORK/output"
