"""End-to-end integration: synthetic dataset -> loader -> train steps -> infer.

Covers the full pipeline the reference exercises via train.py + convert.py
(SURVEY.md §3.1/§3.2) on a tiny config: wav/unit files on disk, spec cache,
bucket sampler with static shapes, the jitted GAN step, and the inference
path with the speaker-embedding windowing.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quickvc_tpu.config import DataConfig, ModelConfig, QuickVCConfig, TrainConfig
from quickvc_tpu.data import BucketSampler, DataLoader, UnitAudioSpecDataset
from quickvc_tpu.data.audio_io import write_wav_int16
from quickvc_tpu.dsp.mel import mel_filterbank
from quickvc_tpu.dsp.stft import spec_to_mel
from quickvc_tpu.models.encoders import embed_utterance_batch
from quickvc_tpu.models.synthesizer import SynthesizerTrn
from quickvc_tpu.train import create_train_state, make_train_step

UNIT_DIM = 12


@pytest.fixture
def synth_dataset(tmp_path, rng):
    """4 synthetic utterances: s16 wav + unit .npy + train list."""
    paths = []
    for i in range(4):
        t = 16000 + i * 4000  # 1.0 - 1.75 s
        wav = (0.3 * np.sin(2 * np.pi * 220 * (i + 1) * np.arange(t) / 16000)
               + 0.05 * rng.standard_normal(t)).astype(np.float32)
        p = tmp_path / f"utt{i}.wav"
        write_wav_int16(str(p), wav, 16000)
        np.save(str(p).replace(".wav", ".npy"),
                rng.standard_normal((t // 320, UNIT_DIM)).astype(np.float32))
        paths.append(str(p))
    list_path = tmp_path / "train.txt"
    list_path.write_text("\n".join(paths) + "\n")
    return str(list_path)


def e2e_config(list_path: str) -> QuickVCConfig:
    return QuickVCConfig(
        train=TrainConfig(segment_size=2560, max_speclen=32, precision="f32",
                          batch_size=2, disc_width=0.25),
        data=DataConfig(training_files=list_path, validation_files=list_path),
        model=ModelConfig(inter_channels=16, hidden_channels=16,
                          upsample_initial_channel=32, gin_channels=16,
                          unit_channels=UNIT_DIM, resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3, 5),),
                          enc_wn_layers=2, flow_wn_layers=2, n_flows=2),
    )


def test_pipeline_trains_and_infers(synth_dataset, rng):
    cfg = e2e_config(synth_dataset)
    cfg.train.transfer = "full"  # this test pins the reference-parity flow
    ds = UnitAudioSpecDataset("train", cfg)
    assert len(ds) == 4
    item = ds[0]
    f = item["spec"].shape[0]
    assert item["spec"].shape[1] == cfg.spec_channels
    assert abs(item["unit"].shape[0] - f) <= 1
    # spec cache materialized beside the wav, keyed by the STFT config
    assert any(p.endswith(ds.spec_suffix)
               for p in os.listdir(os.path.dirname(ds.audiopaths[0])))

    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            [32, 40, 50, 60, 70, 80, 90, 100], shuffle=True)
    loader = DataLoader(ds, sampler, cfg, num_workers=1)
    batches = list(loader)
    assert len(batches) == len(sampler)
    shapes = {b["unit"].shape for b in batches}
    for b in batches:
        assert b["unit"].shape[0] == 2
        assert b["wave"].shape[1] == b["unit"].shape[1] * cfg.data.hop_length
    # static shapes: one shape per bucket
    assert len(shapes) <= len(sampler.buckets)

    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
    basis = jnp.asarray(mel_filterbank(16000, cfg.data.filter_length, 80))
    step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
    losses = []
    for i, b in enumerate(batches[:2]):
        state, metrics = step(state, {k: jnp.asarray(v) for k, v in b.items()},
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss/g/total"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 2

    # Inference with the trained params (reconstruction, reference §3.5)
    unit = jnp.asarray(item["unit"][None, : f - 1])
    spec = jnp.asarray(item["spec"][None, : f - 1])
    mel = spec_to_mel(spec, basis)
    params = {"params": state.g_params}
    g_vec = embed_utterance_batch(
        lambda p, m: net_g.apply(p, m, method=SynthesizerTrn.embed_speaker),
        params, mel)
    wave = net_g.apply(params, unit, g_vec, 0.0, method=SynthesizerTrn.infer)
    assert wave.shape == (1, (f - 1) * cfg.data.hop_length, 1)
    assert np.isfinite(np.asarray(wave)).all()


def test_spec_cache_invalidated_by_config_change(tmp_path, rng):
    """A changed STFT config must never load a stale cached spec.

    The reference caches ``.spec.pt`` unkeyed (data_utils_new_new.py:113-118)
    and silently serves stale spectrograms after a ``hop_length`` change; our
    cache filename carries the (filter, hop, win) fingerprint.
    """
    from quickvc_tpu.config import DataConfig

    t = 16000
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(t) / 16000)).astype(np.float32)
    p = tmp_path / "utt.wav"
    write_wav_int16(str(p), wav, 16000)
    np.save(str(tmp_path / "utt.npy"),
            rng.standard_normal((t // 320, UNIT_DIM)).astype(np.float32))
    lst = tmp_path / "train.txt"
    lst.write_text(f"{p}\n")

    cfg_a = e2e_config(str(lst))
    spec_a = UnitAudioSpecDataset("train", cfg_a)[0]["spec"]

    cfg_b = e2e_config(str(lst))
    cfg_b.data = DataConfig(training_files=str(lst), validation_files=str(lst),
                            filter_length=512, hop_length=128, win_length=512)
    spec_b = UnitAudioSpecDataset("train", cfg_b)[0]["spec"]
    assert spec_b.shape != spec_a.shape  # recomputed, not the stale cache
    assert spec_b.shape[1] == 512 // 2 + 1

    # Both caches coexist under distinct fingerprinted names, and a re-read
    # under the original config still hits its own (bitwise-equal) cache.
    names = sorted(os.listdir(tmp_path))
    assert sum(".spec-" in n for n in names) == 2
    again = UnitAudioSpecDataset("train", cfg_a)[0]["spec"]
    np.testing.assert_array_equal(again, spec_a)


def test_suffix_safe_path_derivation(tmp_path, rng):
    """'.wav' occurring mid-path must not corrupt unit/spec path derivation
    (the reference's path.replace('.wav', ...) substitutes the first match)."""
    d = tmp_path / "corpus.wav"  # adversarial directory name
    d.mkdir()
    t = 16000
    wav = (0.1 * rng.standard_normal(t)).astype(np.float32)
    p = d / "a.wav.b.wav"        # adversarial file name
    write_wav_int16(str(p), wav, 16000)
    np.save(str(d / "a.wav.b.npy"),
            rng.standard_normal((t // 320, UNIT_DIM)).astype(np.float32))
    lst = tmp_path / "train.txt"
    lst.write_text(f"{p}\n")
    cfg = e2e_config(str(lst))
    ds = UnitAudioSpecDataset("train", cfg)
    item = ds[0]
    assert item["unit"].shape[1] == UNIT_DIM
    assert os.path.exists(str(d / ("a.wav.b" + ds.spec_suffix)))


def test_bucket_sampler_rank_sharding():
    """Multi-host batches partition a global batch disjointly per rank."""
    from quickvc_tpu.data import BucketSampler

    lengths = list(range(40, 120))  # 80 items, lengths 40..119
    boundaries = [32, 70, 100, 200]
    samplers = [BucketSampler(lengths, batch_size=4, boundaries=boundaries,
                              shuffle=True, num_replicas=2, rank=r) for r in range(2)]
    for s in samplers:
        s.set_epoch(3)
    b0 = list(samplers[0])
    b1 = list(samplers[1])
    assert len(b0) == len(b1) == len(samplers[0])
    for (k0, idx0), (k1, idx1) in zip(b0, b1):
        assert k0 == k1                      # same bucket order on every rank
        assert len(idx0) == len(idx1) == 4
        assert not (set(idx0) & set(idx1))   # disjoint halves of the global batch
        lo = samplers[0].bucket_lo[k0]
        for i in idx0 + idx1:                # all items belong to the bucket
            assert lengths[i] > lo


def test_directory_corpus_mode(tmp_path, rng):
    """Directory datasets: per-speaker last-utterance eval split."""
    from quickvc_tpu.data.dataset import load_filepaths
    from quickvc_tpu.data.audio_io import write_wav_int16

    for spk in ("alpha", "beta"):
        for u in range(3):
            p = tmp_path / spk / f"utt{u}.wav"
            p.parent.mkdir(exist_ok=True)
            write_wav_int16(str(p), np.zeros(1600, np.float32), 16000)
    train = load_filepaths(str(tmp_path), "train")
    evals = load_filepaths(str(tmp_path), "eval")
    assert len(train) == 4 and len(evals) == 2
    assert not (set(train) & set(evals))
    assert all(p.endswith("utt2.wav") for p in evals)


def test_loader_deterministic_and_ordered(synth_dataset):
    """Loader batches are identical across re-iterations of the same epoch
    (crops keyed by (seed, epoch, batch index)), arrive in sampler order,
    and change when the epoch changes."""
    cfg = e2e_config(synth_dataset)
    cfg.train.transfer = "full"
    ds = UnitAudioSpecDataset("train", cfg)
    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            [32, 40, 50, 60, 70, 80, 90, 100], shuffle=True)
    loader = DataLoader(ds, sampler, cfg, num_workers=4, seed=7)

    sampler.set_epoch(0)
    a = list(loader)
    b = list(loader)
    assert len(a) == len(sampler) > 0
    for x, y in zip(a, b):
        for k in ("unit", "spec", "wave"):
            np.testing.assert_array_equal(x[k], y[k])

    sampler.set_epoch(1)
    c = list(loader)
    assert any(x["unit"].shape != y["unit"].shape or
               not np.array_equal(x["unit"], y["unit"])
               for x, y in zip(a, c))


def test_evaluate_static_shapes(synth_dataset, tmp_path):
    """evaluate() pads items to 1-s frame buckets: one compile per bucket,
    reused across eval calls — not one per item length (VERDICT weak #2)."""
    from quickvc_tpu.dsp.mel import mel_filterbank as mf
    from quickvc_tpu.train.loop import _eval_fns, evaluate
    from quickvc_tpu.utils.logging import Summarizer

    cfg = e2e_config(synth_dataset)
    ds = UnitAudioSpecDataset("eval", cfg)
    state, net_g, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    basis = jnp.asarray(mf(16000, cfg.data.filter_length, 80))
    writer = Summarizer(str(tmp_path))
    seen: dict = {}
    orig_scalars = writer.scalars
    writer.scalars = lambda step, d: (seen.update(d), orig_scalars(step, d))
    evaluate(1, cfg, net_g, state, ds, basis, writer, max_items=4)
    evaluate(2, cfg, net_g, state, ds, basis, writer, max_items=4)
    # beyond-reference eval metrics: reconstruction mel-L1 + speaker-identity
    # cosine between the target d-vector and the generated audio's d-vector
    assert np.isfinite(seen["eval/mel_l1"])
    assert -1.0 <= seen["eval/spk_sim"] <= 1.0
    # cross-speaker conversion metrics (VERDICT r4 item 3): cosine of the
    # converted audio's d-vector to the TARGET voice, and its margin over
    # the source voice
    assert -1.0 <= seen["eval/vc_spk_sim"] <= 1.0
    assert -2.0 <= seen["eval/vc_spk_margin"] <= 2.0
    fns = _eval_fns(cfg, net_g, basis)
    # items span 1.0-1.75 s -> at most 2 one-second buckets across BOTH calls
    assert fns["synth"]._cache_size() <= 2
    assert fns["mel"]._cache_size() <= 2


def test_eval_spk_sim_embeds_cropped_mel(synth_dataset, tmp_path, monkeypatch):
    """eval/spk_sim must embed the generated mel CROPPED to the true frame
    count — the reflect-padded tail would otherwise bias the d-vector the
    metric is scored against (VERDICT r3 weak #3). The conditioning embed
    keeps the padded mel (same windows as serving)."""
    import quickvc_tpu.models.encoders as enc
    from quickvc_tpu.train.loop import evaluate
    from quickvc_tpu.utils.logging import Summarizer

    cfg = e2e_config(synth_dataset)
    ds = UnitAudioSpecDataset("eval", cfg)
    state, net_g, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    basis = jnp.asarray(mel_filterbank(16000, cfg.data.filter_length, 80))
    writer = Summarizer(str(tmp_path))

    calls = []
    orig = enc.embed_utterance_batch

    def spy(apply_fn, params, mel, **kw):
        calls.append(int(mel.shape[1]))
        return orig(apply_fn, params, mel, **kw)

    monkeypatch.setattr(enc, "embed_utterance_batch", spy)
    evaluate(1, cfg, net_g, state, ds, basis, writer, max_items=4)

    bucket = cfg.data.sampling_rate // cfg.data.hop_length
    true_n, padded_n = [], []
    for i in range(4):
        item = ds[i]
        n = min(item["unit"].shape[0], item["spec"].shape[0])
        true_n.append(n)
        padded_n.append(int(np.ceil(n / bucket)) * bucket)
    # the first 2k calls alternate per item: conditioning embed (padded),
    # generated embed (cropped to the true frame count); the cross-speaker
    # VC pass then embeds each converted mel, again cropped to the SOURCE
    # item's true frame count (content length follows the source units)
    recon = calls[: 2 * len(true_n)]
    assert recon[0::2] == padded_n
    assert recon[1::2] == true_n
    vc = calls[2 * len(true_n):]
    assert len(vc) == len(true_n) and vc == true_n
    # the property is only meaningful if at least one item was padded
    assert any(n < p for n, p in zip(true_n, padded_n))


def test_dataset_flac_lengths_and_loading(tmp_path, rng):
    """A FLAC filelist gets EXACT bucket lengths (container-header probe via
    the native decoder) and loads end-to-end — the s16-wav filesize
    heuristic would mis-bucket compressed audio ~2x (VERDICT r3 weak #7;
    inherited reference flaw, data_utils_new_new.py:90-97)."""
    from test_native_audio import encode_flac

    from quickvc_tpu.data import native

    if not native.available():
        import subprocess
        subprocess.run(["make", "-C",
                        os.path.join(os.path.dirname(__file__), "..", "native")],
                       check=True, capture_output=True)
        native._LIB_TRIED = False
        if not native.available():
            pytest.skip("native library unavailable")

    n = 48000  # 3 s at 16 kHz
    base = np.cumsum(rng.integers(-20, 20, size=(n, 1)), axis=0).astype(np.int64)
    p = tmp_path / "utt.flac"
    # blocksize 1024: the mini encoder codes frame numbers as single-byte
    # UTF-8 (< 128 frames), so 3 s needs 47 frames, not 188
    p.write_bytes(encode_flac(base, blocksize=1024, subframe_kind="fixed1"))
    np.save(str(tmp_path / "utt.npy"),
            rng.standard_normal((n // 320, UNIT_DIM)).astype(np.float32))
    list_path = tmp_path / "train.txt"
    list_path.write_text(str(p) + "\n")

    cfg = e2e_config(str(list_path))
    ds = UnitAudioSpecDataset("train", cfg)
    # exact: 48000 samples // hop 320 = 150 frames (the filesize heuristic
    # on this ~compressed file would be far off)
    assert ds.lengths == [n // cfg.data.hop_length]
    item = ds[0]
    assert item["wave"].shape[0] == n
    assert abs(item["spec"].shape[0] - n // cfg.data.hop_length) <= 1


def test_convert_pad_to_bucket():
    """convert.py's reflect bucketing: exact multiples, reflected content."""
    from convert import pad_to_bucket

    w = np.arange(10, dtype=np.float32)
    out = pad_to_bucket(w, 16)
    assert out.shape == (16,) and np.array_equal(out[:10], w)
    assert np.array_equal(out[10:], w[-2:-8:-1])  # reflected tail
    # shorter than one bucket, and pad > len (multi-round reflect)
    assert pad_to_bucket(np.ones(3, np.float32), 16).shape == (16,)
    assert pad_to_bucket(np.ones(1, np.float32), 4).shape == (4,)
    # already aligned: unchanged
    assert pad_to_bucket(w[:8], 8) is w[:8] or np.array_equal(pad_to_bucket(w[:8], 8), w[:8])


def test_loader_worker_exception_propagates(synth_dataset):
    """A failing item load surfaces to the consumer, not a hang."""
    cfg = e2e_config(synth_dataset)
    ds = UnitAudioSpecDataset("train", cfg)
    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            [32, 40, 50, 60, 70, 80, 90, 100], shuffle=False)
    loader = DataLoader(ds, sampler, cfg, num_workers=2)
    ds.audiopaths[0] = "/nonexistent/missing.wav"
    with pytest.raises(Exception):
        list(loader)


def test_process_loader_matches_thread_loader(synth_dataset):
    """mode='process' (spawned shared-memory workers) yields batches
    bit-identical to the thread path — same (seed, epoch, batch index)
    crop contract, zero-copy shm views on the parent side."""
    cfg = e2e_config(synth_dataset)
    cfg.train.transfer = "full"  # the compact variant has its own test
    ds = UnitAudioSpecDataset("train", cfg)
    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            [32, 40, 50, 60, 70, 80, 90, 100], shuffle=True)
    thread_loader = DataLoader(ds, sampler, cfg, num_workers=2, seed=7)
    proc_loader = DataLoader(ds, sampler, cfg, num_workers=2, seed=7,
                             mode="process")
    try:
        for epoch in (0, 1):
            sampler.set_epoch(epoch)
            a = list(thread_loader)
            # copy: shm views are recycled after a window of batches
            b = [{k: v.copy() for k, v in batch.items()}
                 for batch in proc_loader]
            assert len(a) == len(b) == len(sampler)
            for x, y in zip(a, b):
                for k in ("unit", "spec", "wave"):
                    np.testing.assert_array_equal(x[k], y[k])
    finally:
        proc_loader.close()


def test_process_loader_exception_propagates(synth_dataset):
    """A failing item load in a worker PROCESS surfaces too (the traceback
    travels over the result queue)."""
    cfg = e2e_config(synth_dataset)
    ds = UnitAudioSpecDataset("train", cfg)
    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            [32, 40, 50, 60, 70, 80, 90, 100], shuffle=False)
    ds.audiopaths[0] = "/nonexistent/missing.wav"
    loader = DataLoader(ds, sampler, cfg, num_workers=2, mode="process")
    try:
        with pytest.raises(RuntimeError, match="loader worker failed"):
            list(loader)
    finally:
        loader.close()


def test_pipeline_trains_compact_transfer(synth_dataset, tmp_path):
    """run() end-to-end with transfer='compact': loader ships s16 wave +
    halo + units, the step reconstructs spec on device; losses finite,
    checkpoints written, and no host spec cache is built for training."""
    import dataclasses
    import glob

    from quickvc_tpu.train.loop import run

    cfg = e2e_config(synth_dataset)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, transfer="compact",
                                       eval_interval=0, batch_size=8))
    cfg.model_dir = str(tmp_path / "compact_run")
    run(cfg, max_steps=2)
    assert os.path.isdir(os.path.join(cfg.model_dir, "checkpoints"))
    log = open(os.path.join(cfg.model_dir, "train.log")).read()
    assert "step 0" in log and "nan" not in log
    # compact training never computes host spectrograms
    data_dir = os.path.dirname(synth_dataset)
    assert not glob.glob(os.path.join(data_dir, "*.spec-*.npy"))


def test_process_loader_matches_thread_loader_compact(synth_dataset):
    """Process-mode shm protocol with mixed dtypes (bf16 unit, s16 wave,
    i32 counts) yields batches bit-identical to the thread path."""
    import dataclasses

    cfg = e2e_config(synth_dataset)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, transfer="compact",
                                       precision="bf16"))
    ds = UnitAudioSpecDataset("train", cfg, with_spec=False)
    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            [32, 40, 50, 60, 70, 80, 90, 100], shuffle=True)
    thread_loader = DataLoader(ds, sampler, cfg, num_workers=2, seed=7)
    proc_loader = DataLoader(ds, sampler, cfg, num_workers=2, seed=7,
                             mode="process")
    try:
        sampler.set_epoch(0)
        a = list(thread_loader)
        b = [{k: v.copy() for k, v in batch.items()} for batch in proc_loader]
        assert len(a) == len(b) == len(sampler)
        for x, y in zip(a, b):
            assert set(x) == {"unit", "wave_s16", "n_take"}
            for k in x:
                assert x[k].dtype == y[k].dtype
                np.testing.assert_array_equal(
                    np.asarray(x[k]).view(np.uint8),
                    np.asarray(y[k]).view(np.uint8))
    finally:
        proc_loader.close()


def test_loader_skip_next_iter_both_modes(synth_dataset):
    """Mid-epoch resume fast-forward: skipping n batches yields exactly the
    tail of the full epoch, with original crop keys, in BOTH loader modes."""
    cfg = e2e_config(synth_dataset)
    cfg.train.transfer = "full"
    ds = UnitAudioSpecDataset("train", cfg)
    sampler = BucketSampler(ds.lengths, cfg.train.batch_size,
                            [32, 40, 50, 60, 70, 80, 90, 100], shuffle=True)
    for mode in ("thread", "process"):
        loader = DataLoader(ds, sampler, cfg, num_workers=2, seed=7, mode=mode)
        try:
            sampler.set_epoch(2)
            full = [{k: v.copy() for k, v in b.items()} for b in loader]
            loader.skip_next_iter(2)
            tail = [{k: v.copy() for k, v in b.items()} for b in loader]
            assert len(tail) == len(full) - 2
            for x, y in zip(full[2:], tail):
                for k in ("unit", "spec", "wave"):
                    np.testing.assert_array_equal(x[k], y[k])
            # the skip is one-shot: the next iteration is full again
            assert len(list(loader)) == len(full)
        finally:
            loader.close()


def test_compact_run_with_eval(synth_dataset, tmp_path, monkeypatch):
    """run() under compact transfer with eval enabled: the eval path keeps
    its host-spec reference-parity metrics while training ships compact;
    the train writer carries the step-wall telemetry scalars and the eval
    writer the cross-speaker VC metrics."""
    import dataclasses

    from quickvc_tpu.train.loop import run
    from quickvc_tpu.utils.logging import Summarizer

    seen: dict = {}
    orig = Summarizer.scalars
    monkeypatch.setattr(Summarizer, "scalars",
                        lambda self, step, d: (seen.update(d),
                                               orig(self, step, d)))
    cfg = e2e_config(synth_dataset)
    # log/eval at 0 and 5: iterations 1-4 form one clean 4-step telemetry
    # window (sync_every=4), flushed into the step-5 log's scalars
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, transfer="compact",
                                       eval_interval=5, log_interval=5,
                                       batch_size=8))
    cfg.model_dir = str(tmp_path / "compact_eval_run")
    run(cfg, max_steps=6)
    log = open(os.path.join(cfg.model_dir, "train.log")).read()
    assert "eval step 5 | mel_l1" in log
    # eval audio written under the eval summarizer
    assert os.path.isdir(os.path.join(cfg.model_dir, "eval"))
    # step-wall telemetry scalars reached the writer (VERDICT r4 item 4)
    assert seen["time/step_p50"] > 0
    assert seen["time/step_p95"] >= seen["time/step_p50"]
    assert seen["time/step_max"] >= seen["time/step_p95"]
    # cross-speaker VC metrics reached the eval writer (VERDICT r4 item 3)
    assert -1.0 <= seen["eval/vc_spk_sim"] <= 1.0


def test_rss_limit_checkpoints_then_requests_restart(synth_dataset, tmp_path,
                                                     monkeypatch):
    """train.max_host_rss_gb: a crossed limit checkpoints FIRST, then raises
    HostMemoryRestart; a relaunch resumes from that checkpoint. This is the
    loss-free mitigation for host-side leaks (the axon tunnel client's
    ~90 MB/step H2D staging, BENCH.md "Durability flagship") — the
    supervisor-side half lives in tests/test_supervise.py."""
    import dataclasses

    from quickvc_tpu.train.loop import run
    from quickvc_tpu.train.telemetry import HostMemoryRestart
    from quickvc_tpu.utils.logging import Summarizer

    seen: dict = {}
    orig = Summarizer.scalars
    monkeypatch.setattr(Summarizer, "scalars",
                        lambda self, step, d: (seen.update(d),
                                               orig(self, step, d)))
    cfg = e2e_config(synth_dataset)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, eval_interval=0,
                                       batch_size=8, log_interval=2,
                                       max_host_rss_gb=0.001))
    cfg.model_dir = str(tmp_path / "rss_run")
    # the live process is far above 1 MB, so the first logged step (0) trips
    with pytest.raises(HostMemoryRestart) as exc:
        run(cfg, max_steps=4)
    assert exc.value.step == 0 and exc.value.rss_gb > exc.value.limit_gb
    assert seen["host/rss_gb"] == pytest.approx(exc.value.rss_gb, rel=0.5)
    log = open(os.path.join(cfg.model_dir, "train.log")).read()
    assert "requesting restart" in log
    # the checkpoint landed BEFORE the raise — a relaunch with the limit
    # lifted resumes from it and completes
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, max_host_rss_gb=0.0))
    run(cfg2, max_steps=2)
    log = open(os.path.join(cfg.model_dir, "train.log")).read()
    assert "Resumed from checkpoint at step 0" in log
