"""Voice-conversion inference CLI.

Reference parity (convert.py): reads ``convert.txt`` lines ``title|src|tgt``,
converts each src utterance to the tgt speaker, writes float32 wavs.

    python convert.py [--hpfile cfg.json] [--ptfile ckpt] [--hubert hubert.pt]
                      [--txtpath convert.txt] [--outdir output/quickvc]

Checkpoints: ``--ptfile`` accepts either a reference torch ``.pth``
(G checkpoint; ported weight-for-weight) or an orbax checkpoint directory
produced by this framework's trainer. ``--hubert`` is a local bshall/hubert
HuBERT-soft torch checkpoint (the reference fetches it via torch.hub,
convert.py:44; this environment has no network).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from quickvc_tpu.config import load_config
from quickvc_tpu.data.audio_io import read_wav, resample, trim_silence, write_wav
from quickvc_tpu.dsp.mel import mel_filterbank
from quickvc_tpu.dsp.stft import wave_to_mel
from quickvc_tpu.models.encoders import embed_utterance_batch
from quickvc_tpu.models.hubert import HubertSoft
from quickvc_tpu.models.synthesizer import SynthesizerTrn
from quickvc_tpu.utils.compile_cache import enable_persistent_cache


def load_generator_params(path: str, cfg):
    if path.endswith((".pth", ".pt")):
        from quickvc_tpu.utils.torch_port import load_torch_state_dict, port_generator, to_jax
        return to_jax(port_generator(load_torch_state_dict(path), cfg.model))
    if path.endswith(".msgpack"):  # scripts/export_params.py artifact
        import flax.serialization
        from quickvc_tpu.train.state import create_train_state
        state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(jax.device_get(state.g_params),
                                                 f.read())
    # orbax checkpoint dir -> restore TrainState and take g_params
    from quickvc_tpu.train.state import create_train_state
    from quickvc_tpu.utils.checkpoint import CheckpointManager
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.dirname(path.rstrip("/")) if path.endswith("checkpoints")
                            else path)
    restored = mgr.restore_latest(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    return restored[0].g_params


def pad_to_bucket(wav: np.ndarray, bucket: int) -> np.ndarray:
    """Reflect-pad a waveform up to the next multiple of ``bucket`` samples.

    Reflection keeps the padded tail in-distribution (natural-sounding audio
    rather than digital silence), so HuBERT units / speaker windows over the
    pad stay meaningful; the synthesized tail past the true length is cropped.
    Very short inputs reflect repeatedly (np reflect caps at len-1 per round).
    """
    target = int(np.ceil(max(len(wav), bucket) / bucket)) * bucket
    out = wav
    while len(out) < target:
        take = min(target - len(out), max(len(out) - 1, 1))
        out = np.pad(out, (0, take), mode="reflect" if len(out) > 1 else "edge")
    return out


def load_hubert_params(path: str):
    if path.endswith(".msgpack"):  # torch-free artifact (scripts/export_params.py)
        import flax.serialization
        from quickvc_tpu.models.hubert import HubertSoft
        hubert = HubertSoft()
        abstract = jax.eval_shape(
            lambda: hubert.init(jax.random.PRNGKey(0), jnp.zeros((1, 16080))))
        with open(path, "rb") as f:
            params = flax.serialization.from_bytes(abstract["params"], f.read())
        return {"params": jax.tree.map(jnp.asarray, params)}
    import torch
    from quickvc_tpu.utils.hubert_port import port_hubert, validate_hubert_sd
    from quickvc_tpu.utils.torch_port import to_jax

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("hubert", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}
    validate_hubert_sd(sd)  # loud contract check before porting anything
    return {"params": to_jax(port_hubert(sd))}


def main():
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--hpfile", type=str, default="logs/quickvc/config.json")
    parser.add_argument("--ptfile", type=str, default="logs/quickvc/quickvc.pth")
    parser.add_argument("--hubert", type=str, default="logs/hubert-soft.pt")
    parser.add_argument("--txtpath", type=str, default="convert.txt")
    parser.add_argument("--outdir", type=str, default="output/quickvc")
    parser.add_argument("--use_timestamp", default=False, action="store_true")
    parser.add_argument("--noise-scale", type=float, default=1.0,
                        help="prior sampling noise (0 = deterministic)")
    parser.add_argument("--streaming", action="store_true",
                        help="chunked lax.scan synthesis: one compile for any "
                             "utterance length, constant memory")
    parser.add_argument("--chunk-frames", type=int, default=96)
    parser.add_argument("--context-frames", type=int, default=96,
                        help="context frames on each side of a chunk; must "
                             "cover the full-size model's receptive field "
                             "(~75 frames: enc_p 16-layer WN +-32, flow 4x4 "
                             "couplings +-32, decoder ~+-10) for the chunk "
                             "interior to match the batch path exactly. The "
                             "old default 48 was only enough for the "
                             "shallow test models — found by the round-5 "
                             "on-TPU full-size parity run (STREAMING_TPU)")
    parser.add_argument("--bucket-seconds", type=float, default=1.0,
                        help="pad utterances up to this grain so the whole "
                             "batch costs a handful of XLA compiles (same "
                             "strategy as dataset/encode.py); 0 = exact "
                             "lengths, one compile per distinct length "
                             "(reference behavior)")
    parser.add_argument("--hubert-front", type=str, default="faststats",
                        choices=["xla", "faststats", "pallas"],
                        help="HuBERT extractor front implementation "
                             "(models/hubert.py FeatureExtractor). "
                             "'faststats' (default) computes the GroupNorm "
                             "affine in closed form so XLA fuses it into "
                             "conv0 — measured part of the 3123->4721x rt "
                             "e2e win (BENCH.md); numerics identical at the "
                             "compute dtype (tests/test_pallas.py)")
    parser.add_argument("--batch", type=int, default=8,
                        help="pairs per batched forward within a length "
                             "bucket (dataset/encode.py strategy; the chip "
                             "is batch-starved below ~32 — BENCH.md). The "
                             "batch dim is padded to this size so each "
                             "bucket costs exactly one compile. 1 = "
                             "reference-style one pair per forward")
    parser.add_argument("--host-workers", type=int,
                        default=min(8, os.cpu_count() or 1),
                        help="thread-pool width for host-side per-pair "
                             "read/resample/trim and wav writes (the "
                             "reference preprocesses serially per pair, "
                             "convert.py:58-86; numpy/scipy release the "
                             "GIL, so this scales with host cores)")
    args = parser.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    cfg = load_config(args.hpfile)
    sr = cfg.data.sampling_rate

    print("Loading model...")
    net_g = SynthesizerTrn(cfg.spec_channels, cfg.segment_frames, cfg.model)
    g_params = load_generator_params(args.ptfile, cfg)
    hubert = HubertSoft(front_mode=args.hubert_front)
    h_params = load_hubert_params(args.hubert)
    basis = jnp.asarray(mel_filterbank(sr, cfg.data.filter_length, cfg.data.n_mel_channels,
                                       cfg.data.mel_fmin, cfg.data.mel_fmax))

    units_fn = jax.jit(lambda p, w: hubert.apply(p, w, method=HubertSoft.units))
    embed_fn = jax.jit(lambda p, m: net_g.apply(
        {"params": p}, m, method=SynthesizerTrn.embed_speaker))
    if args.streaming:
        from quickvc_tpu.infer import streaming_infer

        def _infer(p, u, g, key):
            return streaming_infer(net_g, p, u, g, hop_length=cfg.data.hop_length,
                                   chunk=args.chunk_frames,
                                   context=args.context_frames,
                                   noise_scale=args.noise_scale, rng=key)[..., None]
    else:
        def _infer(p, u, g, key):
            rngs = {"sample": key} if args.noise_scale != 0.0 else {}
            return net_g.apply({"params": p}, u, g, args.noise_scale,
                               method=SynthesizerTrn.infer, rngs=rngs)
    infer_fn = jax.jit(_infer)

    with open(args.txtpath) as f:
        pairs = [line.strip().split("|") for line in f if line.strip()]

    bucket = int(args.bucket_seconds * sr)
    hop = cfg.data.hop_length

    # ---- Host preprocessing for every pair (read/resample/trim/pad) ----
    # Shape bucketing (dataset/encode.py strategy): reflect-pad both
    # utterances up to the bucket grain so every jitted stage compiles
    # once per bucket instead of once per distinct length; the output is
    # cropped back to the source's true frame count. The reference
    # recompiles nothing (eager torch) but pays per-item dispatch; XLA
    # pays per-SHAPE, so static shapes are the TPU-native equivalent.
    #
    # Pairs preprocess in PARALLEL on a thread pool (the reference's loop
    # is serial per pair, convert.py:58-86): the read/resample/trim numpy
    # work releases the GIL, and the measured CLI wall time was
    # host-floored at ~4.4 s/batch with device compute almost free
    # (BENCH.md "CLI economics") — the host side is where the wall
    # time lives, so it gets the same batch-parallel treatment as the
    # training input pipeline (data/dataset.py).
    from concurrent.futures import ThreadPoolExecutor

    t_start = time.time()

    def prep_pair(pair):
        title, src, tgt = pair
        wav_tgt, tsr = read_wav(tgt)
        wav_tgt = resample(wav_tgt, tsr, sr)
        wav_tgt, _ = trim_silence(wav_tgt, top_db=20)
        wav_src, ssr = read_wav(src)
        wav_src = resample(wav_src, ssr, sr)
        n_frames = len(wav_src) // hop
        if bucket:
            wav_src = pad_to_bucket(wav_src, bucket)
            wav_tgt = pad_to_bucket(wav_tgt, bucket)
        return {"title": title, "tgt": tgt, "src_wav": wav_src,
                "tgt_wav": wav_tgt, "n_frames": n_frames}

    host_pool = ThreadPoolExecutor(max(1, args.host_workers))
    items = list(host_pool.map(prep_pair, pairs))
    t_prep = time.time() - t_start

    # ---- Speaker d-vector once per UNIQUE target utterance ----
    # (convert.txt reuses a handful of targets across many pairs; the
    # reference recomputes the embedding per pair, convert.py:63-67.)
    from quickvc_tpu.ops.fused_mel import wave_to_mel_fast  # Pallas fused featurization

    g_cache: dict[str, jnp.ndarray] = {}
    for it in items:
        if it["tgt"] not in g_cache:
            mel_tgt = wave_to_mel_fast(jnp.asarray(it["tgt_wav"][None]), sr,
                                       cfg.data.filter_length, cfg.data.hop_length,
                                       cfg.data.win_length, cfg.data.n_mel_channels,
                                       cfg.data.mel_fmin, cfg.data.mel_fmax)
            g_cache[it["tgt"]] = embed_utterance_batch(embed_fn, g_params, mel_tgt)

    # ---- Batched conversion: same-length pairs share one forward ----
    # Same-bucket sources are grouped and run as ONE (batch, T) HuBERT +
    # infer program — the chip is batch-starved at 1 (throughput rises
    # ~3.5x from b1 to b8, BENCH.md "Synthesis"). The batch dim is padded
    # to --batch (repeating the last row) so a ragged final group doesn't
    # trigger its own compile; pad rows are dropped before writing.
    groups: dict[int, list[dict]] = {}
    for it in items:
        groups.setdefault(len(it["src_wav"]), []).append(it)

    key = jax.random.PRNGKey(cfg.train.seed)
    nb = max(1, args.batch)
    writes: list = []

    def flush(audio_dev, chunk, t0):
        """Fetch one batch's audio, crop, hand wavs to the writer pool."""
        audio = np.asarray(audio_dev, dtype=np.float32)
        dt = time.time() - t0
        for i, it in enumerate(chunk):
            out = audio[i, :, 0]
            if bucket:
                out = out[: it["n_frames"] * hop]
            name = (f"{time.strftime('%m-%d_%H-%M')}_{it['title']}.wav"
                    if args.use_timestamp else f"{it['title']}.wav")
            # wav writes overlap the next batch's device compute
            writes.append(host_pool.submit(
                write_wav, os.path.join(args.outdir, name), out, sr))
            print(f"{it['title']}: {len(out) / sr:.2f}s audio "
                  f"({len(chunk)}-pair batch in {dt:.2f}s)")

    # Double-buffered dispatch: batch k+1's H2D + HuBERT + infer are
    # ISSUED (async jax dispatch) before batch k's audio is fetched, so
    # transfer/execute/fetch round-trips pipeline instead of serializing.
    # Measured necessary on the remote tunnel: with host prep parallelized
    # the per-batch wall was round-trip-floored at ~4.7 s, nearly
    # independent of audio length (BENCH.md "CLI economics").
    pending = None
    for length in sorted(groups):
        group = groups[length]
        for lo in range(0, len(group), nb):
            chunk = group[lo : lo + nb]
            t0 = time.time()
            src_batch = np.stack([it["src_wav"] for it in chunk]
                                 + [chunk[-1]["src_wav"]] * (nb - len(chunk)))
            g_batch = jnp.concatenate(
                [g_cache[it["tgt"]] for it in chunk]
                + [g_cache[chunk[-1]["tgt"]]] * (nb - len(chunk)), axis=0)
            unit = units_fn(h_params, jnp.asarray(src_batch))
            key, sub = jax.random.split(key)
            audio_dev = infer_fn(g_params, unit, g_batch, sub)
            if pending is not None:
                flush(*pending)
            pending = (audio_dev, chunk, t0)
    if pending is not None:
        flush(*pending)
    for w in writes:
        w.result()  # surface any write error before the summary line
    host_pool.shutdown()
    print(f"{len(items)} pairs in {time.time() - t_start:.2f}s "
          f"(host prep {t_prep:.2f}s on {args.host_workers} workers); "
          f"XLA compiles: "
          f"infer={infer_fn._cache_size()} units={units_fn._cache_size()} "
          f"embed={embed_fn._cache_size()}")


if __name__ == "__main__":
    main()
