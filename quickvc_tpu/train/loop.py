"""Training loop: epochs over the bucketed loader, logging, eval, checkpoints.

Reference parity (train.py:25-222): D-then-G step per batch; scalar + mel
image TensorBoard logging every ``log_interval`` steps; reconstruction eval
and G/D checkpointing every ``eval_interval``; per-epoch exponential LR
decay. TPU-native: the whole step is one jitted function with donated state;
batches are sharded over the data mesh; metrics are fetched only on logging
steps (no per-step device sync).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from quickvc_tpu.config import QuickVCConfig
from quickvc_tpu.data import BucketSampler, DataLoader, UnitAudioSpecDataset
from quickvc_tpu.dsp.mel import mel_filterbank
from quickvc_tpu.dsp.stft import spec_to_mel
from quickvc_tpu.models.synthesizer import SynthesizerTrn
from quickvc_tpu.parallel import batch_sharding, data_parallel_mesh, replicated
from quickvc_tpu.train.state import create_train_state, param_count
from quickvc_tpu.train.step import make_train_step
from quickvc_tpu.train.telemetry import (
    HostMemoryRestart,
    StepWallTracker,
    host_rss_gb,
)
from quickvc_tpu.utils.checkpoint import CheckpointManager
from quickvc_tpu.utils.logging import Summarizer, get_logger, plot_spectrogram

BUCKET_BOUNDARIES = [32, 40, 50, 60, 70, 80, 90, 100, 110, 120, 160, 200, 230,
                     260, 300, 350, 400, 450, 500, 600, 700, 800, 900, 1000]


def _place(tree, sharding):
    """Host pytree -> globally-sharded jax arrays.

    ``sharding`` is a single sharding for the whole tree OR a matching
    pytree of per-leaf shardings (ZeRO-1 state). Single-process: plain
    device_put. Multi-process: every process holds either the full value
    (replicated shardings) or its per-host shard (batch shardings);
    ``make_array_from_process_local_data`` assembles the global array —
    device_put cannot target non-addressable devices.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    if isinstance(sharding, jax.sharding.Sharding):
        sharding = jax.tree.map(lambda _: sharding, tree)
    return jax.tree.map(lambda x, s: jax.make_array_from_process_local_data(
        s, np.asarray(x)), tree, sharding)


def run(cfg: QuickVCConfig, max_steps: int | None = None,
        profile_steps: int = 0,
        init_torch: tuple[str, str | None] | None = None) -> None:
    n_proc, pid = jax.process_count(), jax.process_index()
    # Per-rank log files; TB events from rank 0 only (reference train.py:33-43
    # gates its writers on rank==0 the same way).
    logger = get_logger(cfg.model_dir,
                        "train.log" if pid == 0 else f"train.rank{pid}.log")
    writer = Summarizer(cfg.model_dir) if pid == 0 else None
    writer_eval = Summarizer(cfg.model_dir + "/eval") if pid == 0 else None

    # Data. Compact transfer: the training loader ships s16 wave + units
    # and never touches the host spectrogram path (recomputed on-device in
    # the step); eval keeps host specs for its reference-parity metrics.
    train_ds = UnitAudioSpecDataset("train", cfg,
                                    with_spec=cfg.train.transfer != "compact")
    eval_ds = UnitAudioSpecDataset("eval", cfg)
    sampler = BucketSampler(train_ds.lengths, cfg.train.batch_size, BUCKET_BOUNDARIES,
                            shuffle=True, num_replicas=n_proc, rank=pid)
    loader = DataLoader(train_ds, sampler, cfg, seed=cfg.train.seed,
                        num_workers=cfg.train.loader_workers,
                        mode=cfg.train.loader_mode)

    # Mesh + state
    mesh = data_parallel_mesh()
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    logger.info("Generator params: %.2fM | Discriminator params: %.2fM",
                param_count(state.g_params) / 1e6, param_count(state.d_params) / 1e6)
    if cfg.train.max_host_rss_gb > 0 and n_proc > 1:
        logger.warning(
            "train.max_host_rss_gb is single-process only (a lone rank "
            "exiting would wedge the collective); RSS is still logged, but "
            "restarts belong to the external launcher in multi-process runs")
    # State sharding: fully replicated, or ZeRO-1 (AdamW moments sharded
    # over the data axis; parallel/mesh.py:zero1_state_sharding).
    if cfg.train.zero_opt_state:
        from quickvc_tpu.parallel import zero1_state_sharding
        state_sh = zero1_state_sharding(mesh, state)
    else:
        state_sh = jax.tree.map(lambda _: rep, state)

    ckpt = CheckpointManager(cfg.model_dir,
                             max_to_keep=cfg.train.ckpt_max_to_keep)
    # Restore straight onto the target shardings: in multi-process runs
    # orbax reassembles global arrays only when the abstract tree carries
    # shardings (a host-numpy restore can't span non-addressable devices).
    restored = ckpt.restore_latest(jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        state, state_sh))
    if restored is not None:
        state, start_step = restored  # already placed on `state_sh`
        logger.info("Resumed from checkpoint at step %d", start_step)
    else:
        # No orbax checkpoint: warm-start from reference-layout .pth files —
        # explicit paths (--init-from-torch) or, like reference train.py:61-68,
        # the newest G_*.pth/D_*.pth found in model_dir. This is the official
        # fine-tune-from-G_1200000.pth workflow (reference quickvc.ipynb).
        from quickvc_tpu.train.state import warm_start_from_torch
        from quickvc_tpu.utils.torch_port import latest_torch_checkpoint

        g_path, d_path = init_torch if init_torch else (
            latest_torch_checkpoint(cfg.model_dir, "G_"),
            latest_torch_checkpoint(cfg.model_dir, "D_"))
        if g_path is not None:
            state, it = warm_start_from_torch(state, cfg, g_path, d_path)
            logger.info("Warm-started from torch checkpoint %s%s at iteration "
                        "%d (fresh optimizers)", g_path,
                        f" + {d_path}" if d_path else " (D from scratch)", it)
        state = _place(state, state_sh)

    basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                       cfg.data.n_mel_channels))
    if cfg.train.grad_reduce_dtype != "f32":
        # Explicit-collective DP: shard_map step with the gradient
        # all-reduce in bf16 (halves the 348 MB/step ICI traffic; see
        # parallel/shard_step.py for the exact semantics).
        from quickvc_tpu.parallel.shard_step import make_sharded_train_step
        # config.__post_init__ guarantees the value is "bf16" here ("f16"
        # was rejected: its all-reduce overflows at 65504, poisoning grads).
        step_fn = make_sharded_train_step(cfg, net_g, net_d, basis, mesh,
                                          reduce_dtype=jnp.bfloat16)
    else:
        step_fn = jax.jit(make_train_step(cfg, net_g, net_d, basis),
                          in_shardings=(state_sh, bsh, rep),
                          out_shardings=(state_sh, rep), donate_argnums=(0,))

    if n_proc > 1:
        # Establish the global collective context while ranks are still in
        # lockstep: the first real collective otherwise runs after the step
        # compile, and per-rank compile-time skew (e.g. a one-sided
        # compilation-cache hit) can blow the transport's connect deadline
        # (observed: Gloo's 30 s GetKeyValue timeout on CPU). The tiny
        # all-reduce compiles in milliseconds on every rank, so the
        # communicator for this device set is created — and cached — here.
        probe = _place(np.zeros((jax.device_count(),), np.float32), bsh)
        jax.device_get(jax.jit(jnp.sum, in_shardings=(bsh,),
                               out_shardings=rep)(probe))

    global_step = int(jax.device_get(state.step))
    base_key = jax.random.PRNGKey(cfg.train.seed + 17)
    # Resume epoch from the step counter (reference train.py:66 reconstructs
    # global_step from the epoch; we store the step and derive the epoch).
    # A mid-epoch restore additionally fast-forwards the loader past the
    # batches the interrupted run already trained on, so the resumed
    # trajectory is BIT-IDENTICAL to an uninterrupted one (the reference
    # restarts the whole epoch, replaying a partial epoch's batches) —
    # pinned by tests/test_train_step.py::TestResumeTrajectory.
    epoch0 = global_step // max(1, len(loader)) + 1
    resume_skip = global_step % max(1, len(loader))
    t_last = time.perf_counter()
    nonfinite_logs = 0
    # Step-wall telemetry (train/telemetry.py). Completion is observed by
    # fetching ONE scalar from a `sync_depth`-delayed step's metrics — the
    # only reliable sync on the tunnel (CLAUDE.md: block_until_ready can
    # return early; a fetched scalar cannot). A fetch per STEP serializes
    # the loop against the tunnel round trip (measured: wall ballooned
    # >10x), so the fetch runs once per SYNC_EVERY steps and the tracker
    # ingests the WINDOW MEAN wall per step; a stall inflates its window
    # mean by stall/SYNC_EVERY — still far past the 5x-median trigger for
    # the multi-minute stalls this exists to catch. Windows containing a
    # log/eval/ckpt section are discarded (their cost is already visible
    # in the logged dt) so the distribution stays pure pipeline wall.
    walls = StepWallTracker()
    from collections import deque as _deque
    sync_depth = max(2, cfg.train.prefetch_batches)
    sync_every = 4
    inflight_metrics: _deque = _deque()
    window_steps = 0
    window_dirty = False
    t_window = time.perf_counter()

    def device_batches(host_iter):
        """Prefetch: overlap host->device transfer with the running step.

        Each host loads its rank's slice of the global batch (the sampler
        shards per rank); ``_place`` assembles the globally-sharded array.
        ``train.prefetch_batches`` device batches stay in flight — the
        issued transfers stream while the current step runs. Depth beyond
        1 only helps when transfers are jittery rather than
        bandwidth-bound (measured: on the ~40 MB/s axon tunnel wall =
        max(step, H2D) at any depth; on a PCIe-attached host depth 2
        smooths loader hiccups at the cost of one extra resident batch).
        """
        from collections import deque

        depth = max(1, cfg.train.prefetch_batches)
        pending: deque = deque()
        for host_batch in host_iter:
            pending.append(_place({k: np.asarray(v) for k, v in host_batch.items()},
                                  bsh))
            if len(pending) > depth:
                yield pending.popleft()
        while pending:
            yield pending.popleft()

    # full-wedge watchdog: the stall detector needs a COMPLETED window,
    # so a total hang (tunnel wedge - observed 8 min silent in the
    # round-5 flagship) is invisible to it; the watchdog thread warns on
    # frozen progress (observability only, never kills). Stopped in the
    # finally so it cannot outlive this run (threads leaked across
    # pytest's many run() calls otherwise).
    wd_stop = walls.watchdog(logger, lambda: walls.total_steps)
    try:
        profiling = False
        for epoch in range(epoch0, cfg.train.epochs + 1):
            sampler.set_epoch(epoch)
            # Per-epoch exponential decay (reference train.py:71-72,80-81) via the
            # injected hyperparam — no recompilation.
            lr = cfg.train.learning_rate * (cfg.train.lr_decay ** (epoch - 1))
            # two distinct arrays: aliasing one into both donated leaves trips
            # XLA's "donate the same buffer twice" check
            state.g_opt.hyperparams["learning_rate"] = _place(
                np.asarray(lr, np.float32), rep)
            state.d_opt.hyperparams["learning_rate"] = _place(
                np.asarray(lr, np.float32), rep)
            if epoch == epoch0 and resume_skip:
                loader.skip_next_iter(resume_skip)
            for batch in device_batches(loader):
                # Profiling harness (reference has only a commented-out profiler,
                # train.py:109-115): trace [5, 5 + profile_steps) after warmup.
                if profile_steps and global_step == 5 and not profiling:
                    jax.profiler.start_trace(cfg.model_dir + "/profile")
                    profiling = True
                if profiling and global_step == 5 + profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profile trace written to %s/profile", cfg.model_dir)
                rng = _place(np.asarray(jax.random.fold_in(base_key, global_step)),
                             rep)
                with mesh:
                    state, metrics = step_fn(state, batch, rng)
                inflight_metrics.append(metrics["loss/g/total"])
                while len(inflight_metrics) > sync_depth:
                    inflight_metrics.popleft()  # drop the handle, no fetch
                window_steps += 1
                if window_steps >= sync_every:
                    # sync on the OLDEST retained step (k - sync_depth + 1):
                    # by now it is long complete, so this fetch costs one wire
                    # round trip, not a pipeline drain
                    jax.device_get(inflight_metrics[0])
                    now = time.perf_counter()
                    if not window_dirty:
                        dt_step = (now - t_window) / window_steps
                        stall_med = walls.add(dt_step)
                        if stall_med is not None:
                            logger.warning(
                                "stall: steps %d-%d mean wall %.2f s > %.0fx "
                                "running median %.3f s (stall #%d this run)",
                                global_step - window_steps + 1, global_step,
                                dt_step, walls.stall_factor, stall_med,
                                walls.stalls)
                    t_window = now
                    window_steps = 0
                    window_dirty = False

                if global_step % cfg.train.log_interval == 0:
                    window_dirty = True
                    m = jax.device_get(metrics)
                    # (frames, mels) first-item mel images computed in-step
                    # (reference train.py:174-178); everything else is scalars
                    imgs = {k: m.pop(k) for k in list(m) if k.startswith("img/")}
                    dt = time.perf_counter() - t_last
                    t_last = time.perf_counter()
                    g_total = float(m["loss/g/total"])
                    d_total = float(m["loss/d/total"])
                    # Failure detection. With guard_nonfinite the step itself
                    # skips poisoned updates (params stay finite), so a
                    # non-finite loss is survivable — warn and keep going, but
                    # abort if EVERY logged step in a row is unhealthy (the
                    # data/model is genuinely broken, not one bad batch).
                    # "Unhealthy" is non-finite losses OR a guard-skipped update:
                    # bf16 can overflow only in the backward pass, leaving losses
                    # finite while every update is silently dropped — the
                    # guard/{d,g}_skipped metrics are the only witness of that.
                    # Without the guard, abort immediately rather than write
                    # poisoned checkpoints (resume picks up the last good one).
                    d_skip = float(m.get("guard/d_skipped", 0.0))
                    g_skip = float(m.get("guard/g_skipped", 0.0))
                    losses_finite = np.isfinite(g_total) and np.isfinite(d_total)
                    if not losses_finite or d_skip or g_skip:
                        nonfinite_logs += 1
                        # Either guard protects params on a skipped update, so
                        # an unhealthy logged step is survivable under both.
                        guarded = (cfg.train.guard_nonfinite
                                   or cfg.train.guard_loss_max > 0)
                        if guarded and nonfinite_logs < 10:
                            logger.warning(
                                "unhealthy step %d (g=%s d=%s, guard skipped: "
                                "d=%g g=%g); params untouched, continuing",
                                global_step, g_total, d_total, d_skip, g_skip)
                        else:
                            ckpt.wait()
                            raise FloatingPointError(
                                f"unhealthy training at step {global_step}: "
                                f"g={g_total} d={d_total} "
                                f"d_skipped={d_skip} g_skipped={g_skip}"
                                + (" for 10 consecutive logged steps" if guarded
                                   else "")
                                + "; restart resumes from the last finite "
                                "checkpoint")
                    else:
                        nonfinite_logs = 0
                    logger.info("epoch %d step %d lr %.3e | g %.3f d %.3f mel %.3f kl %.3f "
                                "(%.2f s since last log)", epoch, global_step, lr,
                                g_total, d_total,
                                float(m["loss/g/mel"]), float(m["loss/g/kl"]), dt)
                    rss = host_rss_gb()
                    if writer:
                        # time/step_p50|p95|max over the steps since the last
                        # log — pipeline wall only (eval/ckpt/log time excluded
                        # by resetting t_iter at the end of the loop body)
                        writer.scalars(global_step, m | walls.summary()
                                       | {"host/rss_gb": rss})
                        # reference TB image tags (train.py:174-178)
                        writer.images(global_step, {
                            "slice/mel_org": plot_spectrogram(
                                np.asarray(imgs["img/mel_org"], np.float32).T),
                            "slice/mel_gen": plot_spectrogram(
                                np.asarray(imgs["img/mel_gen"], np.float32).T),
                            "all/mel": plot_spectrogram(
                                np.asarray(imgs["img/mel_all"], np.float32).T),
                        })
                    if (cfg.train.max_host_rss_gb > 0 and n_proc == 1
                            and rss > cfg.train.max_host_rss_gb):
                        # Graceful restart point for host-side memory growth
                        # (the axon tunnel client leaks ~90 MB/step of H2D
                        # staging — environment, BENCH.md "Durability
                        # flagship"): checkpoint, then raise; train.py turns
                        # this into RESTART_EXIT_CODE and
                        # scripts/supervise_train.py relaunches. Resume is
                        # bit-exact, so the restart is trajectory-free.
                        ckpt.wait()
                        if ckpt.latest_step() != global_step:
                            ckpt.save(global_step, state)
                            ckpt.wait()
                        logger.warning(
                            "host RSS %.2f GB > limit %.2f GB: checkpointed "
                            "at step %d, requesting restart", rss,
                            cfg.train.max_host_rss_gb, global_step)
                        raise HostMemoryRestart(
                            rss, cfg.train.max_host_rss_gb, global_step)
                if cfg.train.eval_interval and global_step % cfg.train.eval_interval == 0:
                    window_dirty = True
                    if pid == 0:
                        mel_l1 = evaluate(global_step, cfg, net_g, state, eval_ds,
                                          basis, writer_eval)
                        if mel_l1 is not None:
                            logger.info("eval step %d | mel_l1 %.4f",
                                        global_step, mel_l1)
                    # All processes call save (orbax coordinates the multi-host
                    # write); the state stays a sharded jax tree — orbax snapshots
                    # it to host before returning, so the next step's donation of
                    # these buffers is safe.
                    ckpt.save(global_step, state)
                if (cfg.train.export_torch_every and pid == 0
                        and global_step % cfg.train.export_torch_every == 0):
                    window_dirty = True
                    _export_torch_checkpoints(cfg, state, global_step, epoch, lr)
                    logger.info("exported reference-layout G_%d.pth/D_%d.pth",
                                global_step, global_step)
                global_step += 1
                if max_steps is not None and global_step >= max_steps:
                    ckpt.save(global_step, state)
                    ckpt.wait()
                    return
                if window_dirty:
                    # discard the partial window around a log/eval/ckpt/export
                    # section so its cost never pollutes the pipeline-wall
                    # distribution (it is already visible in the logged dt)
                    t_window = time.perf_counter()
                    window_steps = 0
                    window_dirty = False
            logger.info("====> Epoch %d done", epoch)
        ckpt.wait()
    finally:
        wd_stop.set()


def _export_torch_checkpoints(cfg: QuickVCConfig, state, global_step: int,
                              epoch: int, lr: float) -> None:
    """Write reference-layout G_<step>.pth / D_<step>.pth into model_dir.

    Reference train.py:181-186 saves torch checkpoints every eval_interval;
    with ``train.export_torch_every`` set, a TPU run keeps dropping
    checkpoints the reference ecosystem (its convert.py, forks, tooling) can
    load directly. ``iteration`` carries the epoch, matching the reference's
    save_checkpoint(epoch) call.
    """
    from quickvc_tpu.utils.torch_export import (
        export_discriminator,
        export_generator,
        save_reference_checkpoint,
    )

    g_sd = export_generator(jax.device_get(state.g_params), cfg.model)
    d_sd = export_discriminator(jax.device_get(state.d_params))
    save_reference_checkpoint(
        os.path.join(cfg.model_dir, f"G_{global_step}.pth"), g_sd, epoch, lr)
    save_reference_checkpoint(
        os.path.join(cfg.model_dir, f"D_{global_step}.pth"), d_sd, epoch, lr)


# evaluate()'s jitted programs, cached per (generator, basis) so repeated
# eval calls across the run reuse ONE compiled program per length bucket
# (recreating jax.jit closures per call would recompile every eval).
_EVAL_FNS: dict = {}


def _eval_fns(cfg: QuickVCConfig, net_g: SynthesizerTrn, basis):
    # Keyed by config VALUES, not id(net_g): two generators with the same
    # config trace to identical programs (sharing the entry is correct),
    # and id() can alias different models after GC in long-lived processes
    # (VERDICT r3 weak #6).
    key = (repr(cfg.model), repr(cfg.data), cfg.spec_channels,
           int(basis.shape[0]), int(basis.shape[1]))
    if key not in _EVAL_FNS:
        from quickvc_tpu.ops.fused_mel import wave_to_mel_fast

        def synth(params, unit, g_vec):
            y_hat = net_g.apply(params, unit, g_vec, 0.0,
                                method=SynthesizerTrn.infer)
            y_hat_mel = wave_to_mel_fast(
                y_hat[..., 0], cfg.data.sampling_rate, cfg.data.filter_length,
                cfg.data.hop_length, cfg.data.win_length,
                cfg.data.n_mel_channels, cfg.data.mel_fmin, cfg.data.mel_fmax)
            return y_hat, y_hat_mel

        _EVAL_FNS[key] = {
            "mel": jax.jit(lambda spec: spec_to_mel(spec, basis)),
            "embed": jax.jit(lambda p, m: net_g.apply(
                p, m, method=SynthesizerTrn.embed_speaker)),
            "synth": jax.jit(synth),
        }
    return _EVAL_FNS[key]


def _pad_frames(x: np.ndarray, target: int) -> np.ndarray:
    """Reflect-pad the leading (frame) axis up to ``target`` rows."""
    out = x
    while out.shape[0] < target:
        take = min(target - out.shape[0], max(out.shape[0] - 1, 1))
        out = np.pad(out, [(0, take)] + [(0, 0)] * (out.ndim - 1),
                     mode="reflect" if out.shape[0] > 1 else "edge")
    return out


def evaluate(global_step: int, cfg: QuickVCConfig, net_g: SynthesizerTrn,
             state, eval_ds: UnitAudioSpecDataset, basis, writer: Summarizer,
             max_items: int = 7) -> float | None:
    """Reconstruction eval on a few items (reference train.py:196-222).

    Static-shape serving: items are reflect-padded up to 1-s frame buckets
    so every jitted stage compiles once per bucket (shared across eval
    calls), not once per item length; metrics/plots are cropped back to the
    true frame count (same strategy as dataset/encode.py and convert.py).
    """
    from quickvc_tpu.models.encoders import embed_utterance_batch

    g_params = state.g_params
    if jax.process_count() > 1:
        # evaluate() runs on rank 0 only: pull the (replicated, hence locally
        # addressable) params to host so the single-process jit below never
        # references arrays spanning non-addressable devices.
        g_params = jax.device_get(g_params)
    params = {"params": g_params}
    fns = _eval_fns(cfg, net_g, basis)
    hop = cfg.data.hop_length
    bucket = max(1, cfg.data.sampling_rate // hop)  # 1 s of frames
    mel_l1s, spk_sims = [], []
    stash = []  # (n, padded unit, device d-vector) per item, for the VC pass
    for i in range(min(max_items, len(eval_ds))):
        item = eval_ds[i]
        n = min(item["unit"].shape[0], item["spec"].shape[0])
        padded = int(np.ceil(n / bucket)) * bucket
        unit = jnp.asarray(_pad_frames(item["unit"][:n], padded)[None])
        spec = jnp.asarray(_pad_frames(item["spec"][:n], padded)[None])
        mel = fns["mel"](spec)
        g_vec = embed_utterance_batch(fns["embed"], params, mel)
        y_hat, y_hat_mel = fns["synth"](params, unit, g_vec)
        mel_np = np.asarray(mel)[:, :n]
        y_hat_mel_np = np.asarray(y_hat_mel)[:, :n]
        writer.images(global_step, {
            f"gen/mel_{i}": plot_spectrogram(y_hat_mel_np[0].T),
            f"gt/mel_{i}": plot_spectrogram(mel_np[0].T),
        })
        writer.audios(global_step, {
            f"gen/audio_{i}": np.asarray(y_hat[0, : n * hop, 0]),
            f"gt/audio_{i}": item["wave"][:, 0],
        }, cfg.data.sampling_rate)
        # Reconstruction quality metric: log-mel L1 between the generated
        # audio and the source mel (the quantity BASELINE.md gates on).
        nmin = min(y_hat_mel_np.shape[1], mel_np.shape[1])
        mel_l1s.append(float(np.mean(np.abs(
            y_hat_mel_np[:, :nmin] - mel_np[:, :nmin]))))
        # Speaker-identity metric (beyond reference): cosine similarity
        # between the target d-vector and the GENERATED audio's d-vector —
        # does synthesis preserve the voice the decoder was conditioned
        # on? Reuses the model's own speaker encoder + the same bucketed
        # embed program as the conditioning pass. Cropped to the true n
        # frames (like mel_l1 above) so the reflect-padded tail never
        # biases the d-vector being scored; compiles stay bounded — the
        # window count inside embed_utterance_batch pads to a multiple
        # of 8 (VERDICT r3 weak #3).
        g_hat = np.asarray(
            embed_utterance_batch(fns["embed"], params, y_hat_mel[:, :n]))
        g_np = np.asarray(g_vec)
        spk_sims.append(float(
            (g_np * g_hat).sum()
            / (np.linalg.norm(g_np) * np.linalg.norm(g_hat) + 1e-8)))
        stash.append((n, unit, g_vec))
    # Cross-speaker conversion metric (beyond reference, VERDICT r4 item 3):
    # the reference's eval is reconstruction-only (train.py:196-222), but the
    # product task is conversion — content from item i rendered in the voice
    # of item j != i. For each item, pick the MOST DISTINCT other eval voice
    # (argmin d-vector cosine, so the margin below is meaningful even when
    # adjacent eval items share a speaker), convert, and score the generated
    # audio's d-vector against the TARGET voice (eval/vc_spk_sim) and its
    # margin over the SOURCE voice (eval/vc_spk_margin > 0 means the output
    # sounds more like the target than the source — the conversion is
    # working). Reuses the reconstruction pass's padded units, cached
    # d-vectors, and the same bucketed jit programs: zero extra compiles.
    vc_sims, vc_margins = [], []
    if len(stash) >= 2:
        g_host = np.stack([np.asarray(g).reshape(-1) for _, _, g in stash])
        g_unit = g_host / (np.linalg.norm(g_host, axis=1, keepdims=True) + 1e-8)
        cos = g_unit @ g_unit.T
        np.fill_diagonal(cos, np.inf)
        targets = np.argmin(cos, axis=1)
        for i, (n, unit, _) in enumerate(stash):
            j = int(targets[i])
            y_vc, y_vc_mel = fns["synth"](params, unit, stash[j][2])
            g_hat = np.asarray(embed_utterance_batch(
                fns["embed"], params, y_vc_mel[:, :n])).reshape(-1)
            g_hat = g_hat / (np.linalg.norm(g_hat) + 1e-8)
            sim_t = float(g_hat @ g_unit[j])
            sim_s = float(g_hat @ g_unit[i])
            vc_sims.append(sim_t)
            vc_margins.append(sim_t - sim_s)
            if i == 0:
                writer.audios(global_step, {
                    "vc/audio_0": np.asarray(y_vc[0, : n * hop, 0])},
                    cfg.data.sampling_rate)
    mean_l1 = float(np.mean(mel_l1s)) if mel_l1s else None
    if mean_l1 is not None:
        scalars = {"eval/mel_l1": mean_l1,
                   "eval/spk_sim": float(np.mean(spk_sims))}
        if vc_sims:
            scalars["eval/vc_spk_sim"] = float(np.mean(vc_sims))
            scalars["eval/vc_spk_margin"] = float(np.mean(vc_margins))
        writer.scalars(global_step, scalars)
    writer.flush()
    return mean_l1
