"""Training-step tests: one jitted GAN step, single-device and on an 8-way mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quickvc_tpu.config import DataConfig, ModelConfig, QuickVCConfig, TrainConfig
from quickvc_tpu.dsp.mel import mel_filterbank
from quickvc_tpu.parallel import batch_sharding, data_parallel_mesh, replicated
from quickvc_tpu.train import create_train_state, make_train_step


def tiny_config() -> QuickVCConfig:
    return QuickVCConfig(
        train=TrainConfig(segment_size=2560, max_speclen=32, precision="f32",
                          learning_rate=1e-4, disc_width=0.25),
        data=DataConfig(),
        model=ModelConfig(inter_channels=16, hidden_channels=16,
                          upsample_initial_channel=32, gin_channels=16,
                          unit_channels=12,
                          resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3, 5),),
                          enc_wn_layers=2, flow_wn_layers=2, n_flows=2),
    )


def make_batch(cfg, rng, batch=2, frames=16):
    return {
        "unit": jnp.asarray(rng.standard_normal((batch, frames, cfg.model.unit_channels)).astype(np.float32)),
        "spec": jnp.asarray(np.abs(rng.standard_normal((batch, frames, cfg.spec_channels))).astype(np.float32)),
        "wave": jnp.asarray(rng.standard_normal((batch, frames * cfg.data.hop_length, 1)).astype(np.float32) * 0.1),
    }


class TestTrainStep:
    def test_single_step_updates_params(self, rng):
        cfg = tiny_config()
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                           cfg.data.n_mel_channels))
        step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
        batch = make_batch(cfg, rng)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert int(new_state.step) == 1
        for k in ("loss/g/total", "loss/d/total", "loss/g/mel", "loss/g/kl", "loss/g/fm"):
            v = float(metrics[k])
            assert np.isfinite(v), f"{k} not finite"
        # observability parity (reference train.py:168-178) + grad norms
        assert metrics["loss/g"].shape == (6,)          # per-disc loss/g/{i}
        assert metrics["loss/d/r"].shape == (6,)
        seg_f, mels = cfg.segment_frames, cfg.data.n_mel_channels
        assert metrics["img/mel_gen"].shape == (seg_f, mels)
        assert metrics["img/mel_org"].shape == (seg_f, mels)
        assert metrics["img/mel_all"].shape[1] == mels  # full-length mel
        assert float(metrics["grad_norm/g"]) > 0
        assert float(metrics["grad_norm/d"]) > 0
        # G and D params actually moved
        moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             state.g_params, new_state.g_params)
        assert max(jax.tree.leaves(moved)) > 0

    def test_data_parallel_mesh_step(self, rng):
        """Full step jitted over an 8-device mesh with batch sharding."""
        assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
        cfg = tiny_config()
        mesh = data_parallel_mesh(8)
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                           cfg.data.n_mel_channels))
        rep = replicated(mesh)
        bsh = batch_sharding(mesh)
        state = jax.device_put(state, rep)
        batch = jax.device_put(make_batch(cfg, rng, batch=8), bsh)
        step = jax.jit(make_train_step(cfg, net_g, net_d, basis),
                       in_shardings=(rep, bsh, rep),
                       out_shardings=(rep, rep),
                       donate_argnums=(0,))
        with mesh:
            new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss/g/total"]))
        assert np.isfinite(float(metrics["loss/d/total"]))

    def test_determinism(self, rng):
        cfg = tiny_config()
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                           cfg.data.n_mel_channels))
        step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
        batch = make_batch(cfg, rng)
        s1, m1 = step(state, batch, jax.random.PRNGKey(7))
        s2, m2 = step(state, batch, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(m1["loss/g/total"]), float(m2["loss/g/total"]), rtol=1e-6)

    def test_nonfinite_guard_skips_update(self, rng):
        """A batch that poisons the grads must leave params + moments untouched.

        Reference parity: under AMP the reference's GradScaler silently skips
        optimizer steps whose grads contain inf/nan (train.py:133-137,
        155-162); ``guard_nonfinite`` is that skip without the loss scaling.
        """
        cfg = tiny_config()
        assert cfg.train.guard_nonfinite  # on by default
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                           cfg.data.n_mel_channels))
        step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
        batch = make_batch(cfg, rng)
        bad = dict(batch, wave=jnp.full_like(batch["wave"], jnp.nan))

        skipped, m_bad = step(state, bad, jax.random.PRNGKey(1))
        assert float(m_bad["guard/d_skipped"]) == 1.0
        assert float(m_bad["guard/g_skipped"]) == 1.0
        assert int(skipped.step) == 1  # step counter still advances (reference: global_step does too)
        for old, new in ((state.g_params, skipped.g_params),
                         (state.d_params, skipped.d_params),
                         (state.g_opt, skipped.g_opt),
                         (state.d_opt, skipped.d_opt)):
            for a, b in zip(jax.tree.leaves(old), jax.tree.leaves(new)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # the same compiled step still trains on a clean batch
        trained, m_ok = step(state, batch, jax.random.PRNGKey(1))
        assert float(m_ok["guard/d_skipped"]) == 0.0
        assert float(m_ok["guard/g_skipped"]) == 0.0
        moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             state.g_params, trained.g_params)
        assert max(jax.tree.leaves(moved)) > 0

    def test_loss_max_guard_fp16_overflow_parity(self, rng):
        """Finite-but-huge losses must be skipped like an fp16 AMP overflow.

        The reference trains under fp16 autocast (train.py:117-131): a loss
        past fp16's 65504 max would overflow to inf there and GradScaler
        would skip the step. bf16 keeps such steps finite, so without
        ``guard_loss_max`` their poisoned updates are applied — measured on
        the real-unit TPU overfit (BENCH.md: recurring 1e12..1e31 spikes).
        """
        from quickvc_tpu.train.step import _finite_flag

        # unit semantics of the threshold
        tree = {"w": jnp.ones((4,))}
        big, small = jnp.float32(1e5), jnp.float32(1e4)
        assert not bool(_finite_flag(tree, big, loss_max=65504.0))
        assert bool(_finite_flag(tree, small, loss_max=65504.0))
        assert bool(_finite_flag(tree, big))  # loss_max=0 disables

        cfg = tiny_config()
        assert cfg.train.guard_loss_max == 65504.0  # fp16 max, on by default
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(
            cfg.data.sampling_rate, cfg.data.filter_length,
            cfg.data.n_mel_channels))
        step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
        batch = make_batch(cfg, rng)
        # 1e6x real-wave amplitude: both phases' losses explode past 65504
        # while staying FINITE (measured ~1.6e6 / 4.8e5) — the inf/nan check
        # alone would let these poisoned updates through.
        huge = dict(batch, wave=batch["wave"] * 1e6)

        skipped, m = step(state, huge, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss/d/total"]))  # threshold, not inf
        assert np.isfinite(float(m["loss/g/total"]))
        assert float(m["guard/d_skipped"]) == 1.0
        assert float(m["guard/g_skipped"]) == 1.0
        for old, new in ((state.g_params, skipped.g_params),
                         (state.d_params, skipped.d_params),
                         (state.g_opt, skipped.g_opt),
                         (state.d_opt, skipped.d_opt)):
            for a, b in zip(jax.tree.leaves(old), jax.tree.leaves(new)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_loss_max_guard_independent_of_nonfinite_guard(self, rng):
        """guard_loss_max must protect even with guard_nonfinite=False.

        ADVICE r3: the threshold used to sit inside ``if guard_nonfinite``,
        so setting only the loss cap silently provided no protection. Now
        either knob alone activates the skip (the loss-only mode checks just
        the scalars — no per-leaf grad sums).
        """
        import dataclasses

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, guard_nonfinite=False,
                                           guard_loss_max=65504.0))
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(
            cfg.data.sampling_rate, cfg.data.filter_length,
            cfg.data.n_mel_channels))
        step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
        batch = make_batch(cfg, rng)
        huge = dict(batch, wave=batch["wave"] * 1e6)

        skipped, m = step(state, huge, jax.random.PRNGKey(1))
        assert float(m["guard/d_skipped"]) == 1.0
        assert float(m["guard/g_skipped"]) == 1.0
        for old, new in ((state.g_params, skipped.g_params),
                         (state.d_params, skipped.d_params),
                         (state.g_opt, skipped.g_opt),
                         (state.d_opt, skipped.d_opt)):
            for a, b in zip(jax.tree.leaves(old), jax.tree.leaves(new)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # a clean batch still trains through the same compiled step
        trained, m_ok = step(state, batch, jax.random.PRNGKey(1))
        assert float(m_ok["guard/g_skipped"]) == 0.0
        moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             state.g_params, trained.g_params)
        assert max(jax.tree.leaves(moved)) > 0

    def test_vjp_step_matches_two_forward_reference(self, rng):
        """The single-forward (jax.vjp) step == an explicit two-forward step.

        Re-implements the naive structure (G forward re-run inside the G
        grad with the same rngs, as the step used before the vjp rewrite)
        and checks the production step produces identical metrics and
        updated parameters.
        """
        import optax

        from quickvc_tpu.dsp.stft import spec_to_mel, wave_to_mel
        from quickvc_tpu.losses import (discriminator_loss, feature_loss,
                                        generator_loss, kl_loss)
        from quickvc_tpu.ops.slicing import slice_segments
        from quickvc_tpu.train.state import TrainState, make_optimizer

        cfg = tiny_config()
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                           cfg.data.n_mel_channels))
        batch = make_batch(cfg, rng)
        key = jax.random.PRNGKey(11)

        new_state, metrics = jax.jit(make_train_step(cfg, net_g, net_d, basis))(
            state, batch, key)

        opt = make_optimizer(cfg)
        hop, seg_frames, seg_samples = (cfg.data.hop_length, cfg.segment_frames,
                                        cfg.train.segment_size)

        def two_forward_step(st, b, k):
            unit, spec, y = b["unit"], b["spec"], b["wave"]
            k_sample, k_slice = jax.random.split(k)
            rngs = {"sample": k_sample, "slice": k_slice}
            mel = spec_to_mel(spec, basis)

            def fwd(gp):
                return net_g.apply({"params": gp}, unit, spec, mel, rngs=rngs)

            y_hat, _, ids, _ = fwd(st.g_params)
            y_seg = slice_segments(y, ids * hop, seg_samples)

            def d_loss_fn(dp):
                lr_, lg_, _, _ = net_d.apply({"params": dp}, y_seg,
                                             jax.lax.stop_gradient(y_hat))
                loss, _, _ = discriminator_loss(lr_, lg_)
                return loss

            d_grads = jax.grad(d_loss_fn)(st.d_params)
            d_up, d_opt = opt.update(d_grads, st.d_opt, st.d_params)
            d_params = optax.apply_updates(st.d_params, d_up)

            def g_loss_fn(gp):
                y_hat2, _, ids2, latents = fwd(gp)
                z, z_p, m_p, logs_p, m_q, logs_q = latents
                y_seg2 = slice_segments(y, ids2 * hop, seg_samples)
                _, lg_, fr_, fg_ = net_d.apply({"params": d_params}, y_seg2, y_hat2)
                y_hat_mel = wave_to_mel(y_hat2[..., 0], basis, cfg.data.filter_length,
                                        hop, cfg.data.win_length, method="matmul")
                y_mel = slice_segments(mel, ids2, seg_frames)
                loss_mel = cfg.train.c_mel * jnp.mean(jnp.abs(y_mel - y_hat_mel))
                loss_kl = cfg.train.c_kl * kl_loss(z_p, logs_q, m_p, logs_p)
                loss_gen, _ = generator_loss(lg_)
                return loss_gen + feature_loss(fr_, fg_) + loss_mel + loss_kl

            g_grads = jax.grad(g_loss_fn)(st.g_params)
            g_up, g_opt = opt.update(g_grads, st.g_opt, st.g_params)
            g_params = optax.apply_updates(st.g_params, g_up)
            return TrainState(step=st.step + 1, g_params=g_params,
                              d_params=d_params, g_opt=g_opt, d_opt=d_opt)

        ref_state = jax.jit(two_forward_step)(state, batch, key)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    rtol=2e-5, atol=2e-6),
            (new_state.g_params, new_state.d_params),
            (ref_state.g_params, ref_state.d_params))
        assert np.isfinite(float(metrics["loss/g/total"]))

    def test_bf16_precision_step(self, rng):
        """bf16 compute policy: losses finite, params still f32."""
        cfg = tiny_config()
        cfg.train.precision = "bf16"
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                           cfg.data.n_mel_channels))
        step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
        batch = make_batch(cfg, rng)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss/g/total"]))
        assert np.isfinite(float(metrics["loss/d/total"]))
        dtypes = {p.dtype for p in jax.tree.leaves(new_state.g_params)}
        assert dtypes == {np.dtype(np.float32)}


TP_SCRIPT = """
import os
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {testdir!r})
from test_train_step import make_batch, tiny_config
from quickvc_tpu.dsp.mel import mel_filterbank
from quickvc_tpu.parallel.tp import batch_sharding_2d, mesh_2d, state_shardings
from quickvc_tpu.train import create_train_state, make_train_step

cfg = tiny_config()
mesh = mesh_2d(data=2, model=4)
state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
basis = jnp.asarray(mel_filterbank(cfg.data.sampling_rate, cfg.data.filter_length,
                                   cfg.data.n_mel_channels))
st_sh = state_shardings(mesh, state, min_channels=16)
bsh = batch_sharding_2d(mesh)
rep = NamedSharding(mesh, P())
state = jax.device_put(state, st_sh)
rng = np.random.default_rng(1234)
batch = jax.device_put(make_batch(cfg, rng, batch=4), bsh)
step = jax.jit(make_train_step(cfg, net_g, net_d, basis),
               in_shardings=(st_sh, bsh, rep), out_shardings=(st_sh, rep))
with mesh:
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
g = float(metrics["loss/g/total"]); d = float(metrics["loss/d/total"])
assert np.isfinite(g) and np.isfinite(d), (g, d)
specs = jax.tree.leaves(jax.tree.map(
    lambda x: x.sharding.spec, new_state.g_params,
    is_leaf=lambda x: hasattr(x, "sharding")))
assert any("model" in str(s) for s in specs)
print("TP_OK", g, d, flush=True)
os._exit(0)  # skip interpreter teardown: XLA CPU collectives can abort there
"""


class TestTensorParallel:
    def test_2d_mesh_tp_step(self):
        """('data','model') mesh: wide kernels channel-sharded, step runs.

        Runs in a subprocess: XLA CPU's experimental multi-device
        collectives can abort at interpreter shutdown (after the test body
        succeeds), which would kill the whole pytest process. Success is
        the TP_OK marker; the subprocess skips teardown via os._exit.
        """
        import os
        import subprocess
        import sys

        repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
        script = TP_SCRIPT.format(repo=repo, testdir=os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run([sys.executable, "-c", script],
                              capture_output=True, text=True, timeout=900)
        assert "TP_OK" in proc.stdout, (
            f"TP subprocess failed (rc={proc.returncode}):\n"
            f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}")


    def test_scaled_tp_config_layout(self):
        """configs/quickvc_tp.json — the documented width where TP pays
        (BENCH.md roofline: upsample_initial_channel 4096 = 64x decoder conv
        weights). eval_shape-only layout check: the wide kernels shard 8-way
        on the model axis and per-device parameter bytes drop >= 5x vs
        replicated. Full numerics at this width run once per round via
        scripts/tp_scaled_contract.py (TP_CONTRACT_r{N}.json artifact)."""
        import os

        from quickvc_tpu.config import load_config
        from quickvc_tpu.parallel.tp import mesh_2d, param_shardings
        from quickvc_tpu.train.state import build_models

        repo = os.path.join(os.path.dirname(__file__), "..")
        cfg = load_config(os.path.join(repo, "configs", "quickvc_tp.json"))
        assert cfg.model.upsample_initial_channel == 4096
        net_g, _ = build_models(cfg)
        k = jax.random.PRNGKey(0)
        f = 32  # >= segment_frames: __call__ slices a 32-frame segment
        abstract = jax.eval_shape(lambda: net_g.init(
            {"params": k, "sample": k, "slice": k},
            jnp.zeros((1, f, cfg.model.unit_channels)),
            jnp.zeros((1, f, cfg.spec_channels)),
            jnp.zeros((1, f, cfg.data.n_mel_channels))))["params"]
        mesh = mesh_2d(data=1, model=8)
        shardings = param_shardings(mesh, abstract, min_channels=256)

        total = per_dev = sharded = 0
        for leaf, sh in zip(jax.tree.leaves(abstract),
                            jax.tree.leaves(shardings, is_leaf=lambda s:
                                            hasattr(s, "spec"))):
            b = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
            total += b
            if "model" in str(sh.spec):
                per_dev += b // 8
                sharded += 1
            else:
                per_dev += b
        # the scaled decoder pushes total params past ~3 GB f32 — the regime
        # the config documents — and TP recovers most of it per device
        assert total > 2_500_000_000, total
        assert per_dev * 5 < total, (per_dev, total)
        assert sharded > 20, sharded


class TestZero1OptState:
    """ZeRO-1 optimizer-state sharding (parallel/mesh.py:zero1_state_sharding).

    The AdamW update is elementwise, so sharding the moments over the data
    axis must not change the numerics — only where the state lives. Pins:
    (a) params after a zero-sharded step == replicated step, (b) the moment
    leaves are actually distributed, (c) a second (donated-carry) step runs.
    """

    def test_zero1_matches_replicated_and_shards_moments(self, rng):
        from quickvc_tpu.parallel import zero1_state_sharding

        assert jax.device_count() >= 8
        cfg = tiny_config()
        mesh = data_parallel_mesh(8)
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(
            cfg.data.sampling_rate, cfg.data.filter_length,
            cfg.data.n_mel_channels))
        rep, bsh = replicated(mesh), batch_sharding(mesh)
        rep_tree = jax.tree.map(lambda _: rep, state)
        zsh = zero1_state_sharding(mesh, state)
        host_state = jax.device_get(state)
        batch = make_batch(cfg, rng, batch=8)
        key = jax.random.PRNGKey(3)

        step = make_train_step(cfg, net_g, net_d, basis)
        f_rep = jax.jit(step, in_shardings=(rep_tree, bsh, rep),
                        out_shardings=(rep_tree, rep))
        f_zero = jax.jit(step, in_shardings=(zsh, bsh, rep),
                         out_shardings=(zsh, rep), donate_argnums=(0,))
        with mesh:
            b = jax.device_put(batch, bsh)
            s_rep, m_rep = f_rep(jax.device_put(host_state, rep_tree), b, key)
            s_z, m_z = f_zero(jax.device_put(host_state, zsh), b, key)

        # Step-1 losses come from identical inputs; only reduction grouping
        # differs under the repartitioning (observed ~7e-6 rel on D loss).
        np.testing.assert_allclose(float(m_rep["loss/g/total"]),
                                   float(m_z["loss/g/total"]), rtol=1e-4)
        np.testing.assert_allclose(float(m_rep["loss/d/total"]),
                                   float(m_z["loss/d/total"]), rtol=1e-4)

        # Post-update params get an ENVELOPE, not exact equality: the
        # repartitioned conv backward reassociates f32 sums whose terms
        # cancel heavily (weight-norm direction grads), moving gradient
        # elements by up to ~1e-4 absolute, and Adam's first-step sign(g)
        # normalization turns any near-zero gradient into a full ±lr
        # update — bounding per-param movement at 2*lr exactly. A
        # mis-normalized reduction (e.g. a missing 1/n) would move most
        # elements far beyond this.
        def _close(a, c):
            diff = np.abs(np.asarray(jnp.asarray(a)) - np.asarray(jnp.asarray(c)))
            assert diff.max() <= 2.5 * cfg.train.learning_rate, diff.max()

        jax.tree.map(_close, s_rep.g_params, s_z.g_params)
        jax.tree.map(_close, s_rep.d_params, s_z.d_params)

        # Training DYNAMICS must agree: 3 more steps on the same batch, the
        # loss trajectories track within f32 trajectory noise.
        for i in range(3):
            k2 = jax.random.PRNGKey(10 + i)
            with mesh:
                s_rep, m_rep = f_rep(s_rep, b, k2)
                s_z, m_z = f_zero(s_z, b, k2)
            np.testing.assert_allclose(float(m_rep["loss/g/total"]),
                                       float(m_z["loss/g/total"]), rtol=2e-3)

        # the big moment leaves really are sharded (not replicated)
        opt_leaves = [l for l in jax.tree.leaves(s_z.g_opt)
                      + jax.tree.leaves(s_z.d_opt) if hasattr(l, "sharding")]
        big = max(opt_leaves, key=lambda l: l.size)
        assert not big.sharding.is_fully_replicated
        sharded_bytes = sum(l.size for l in opt_leaves
                            if not l.sharding.is_fully_replicated)
        total_bytes = sum(l.size for l in opt_leaves)
        assert sharded_bytes / total_bytes > 0.9  # moments dominate

        assert int(jax.device_get(s_z.step)) == 4  # donated carry stepped 4x

    def test_run_with_zero_opt_state_resumes(self, tmp_path):
        """Loop-level wiring: train 4 steps with ZeRO-1 state, checkpoint,
        resume onto the sharded layout, continue to 6."""
        import os
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_e2e import e2e_config
        from quickvc_tpu.train.loop import run

        # build the tiny synthetic dataset inline (fixture-free)
        import numpy as np2
        from quickvc_tpu.data.audio_io import write_wav_int16
        g = np2.random.default_rng(0)
        paths = []
        for i in range(4):
            t = 16000 + i * 4000
            wav = (0.2 * np2.sin(2 * np2.pi * 220 * (i + 1)
                                 * np2.arange(t) / 16000)).astype(np2.float32)
            p = tmp_path / f"utt{i}.wav"
            write_wav_int16(str(p), wav, 16000)
            np2.save(str(tmp_path / f"utt{i}.npy"),
                     g.standard_normal((t // 320, 12)).astype(np2.float32))
            paths.append(str(p))
        lst = tmp_path / "train.txt"
        lst.write_text("\n".join(paths) + "\n")

        cfg = e2e_config(str(lst))
        cfg.model.unit_channels = 12
        cfg.model_dir = str(tmp_path / "run")
        cfg.train.zero_opt_state = True
        cfg.train.eval_interval = 0
        cfg.train.batch_size = 8
        run(cfg, max_steps=4)
        run(cfg, max_steps=6)
        log = open(os.path.join(cfg.model_dir, "train.log")).read()
        assert "Resumed from checkpoint at step 4" in log


class TestShardMapStep:
    """Explicit-collective DP step (parallel/shard_step.py).

    With every shard fed the SAME local batch and the SAME rng
    (per_shard_rng=False), the cross-shard pmean averages 8 identical
    gradient sets — so the sharded step must reproduce the single-device
    step on the local batch. That pins the in/out specs, the reduction
    normalization, and the scalar pmean wiring all at once.
    """

    def _setup(self, rng):
        cfg = tiny_config()
        state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(
            cfg.data.sampling_rate, cfg.data.filter_length,
            cfg.data.n_mel_channels))
        host_state = jax.device_get(state)
        local = make_batch(cfg, rng, batch=2)
        tiled = {k: jnp.concatenate([v] * 8, axis=0) for k, v in local.items()}
        return cfg, net_g, net_d, basis, host_state, local, tiled

    def test_identical_shards_match_local_step(self, rng):
        from quickvc_tpu.parallel import make_sharded_train_step

        assert jax.device_count() >= 8
        cfg, net_g, net_d, basis, host_state, local, tiled = self._setup(rng)
        mesh = data_parallel_mesh(8)
        key = jax.random.PRNGKey(3)

        ref_step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
        ref_state, ref_m = ref_step(jax.device_put(host_state), local, key)

        sh_step = make_sharded_train_step(cfg, net_g, net_d, basis, mesh,
                                          per_shard_rng=False)
        sh_state, sh_m = sh_step(
            jax.device_put(host_state, replicated(mesh)),
            jax.device_put(tiled, batch_sharding(mesh)), key)

        # Gate at lr/10: the two programs are compiled differently (fusion
        # order), so grad elements near AdamW's eps floor can move an
        # update by ~1e-6 — but a WRONG reduction (e.g. psum instead of
        # pmean) would shift every update by ~lr itself (1e-4).
        tol = cfg.train.learning_rate / 10
        for a, b in zip(jax.tree.leaves(ref_state.g_params),
                        jax.tree.leaves(sh_state.g_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=tol)
        for a, b in zip(jax.tree.leaves(ref_state.d_params),
                        jax.tree.leaves(sh_state.d_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=tol)
        for k in ("loss/g/total", "loss/d/total", "loss/g/mel", "loss/g/kl"):
            np.testing.assert_allclose(float(ref_m[k]), float(sh_m[k]),
                                       rtol=1e-5)

    def test_bf16_reduce_close_to_f32(self, rng):
        """bf16 all-reduce rounds only the cross-shard mean: params must
        stay within one bf16 ulp of lr of the f32-reduced result."""
        from quickvc_tpu.parallel import make_sharded_train_step

        cfg, net_g, net_d, basis, host_state, local, tiled = self._setup(rng)
        mesh = data_parallel_mesh(8)
        key = jax.random.PRNGKey(3)

        outs = {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            step = make_sharded_train_step(cfg, net_g, net_d, basis, mesh,
                                           reduce_dtype=dt,
                                           per_shard_rng=False)
            st, m = step(jax.device_put(host_state, replicated(mesh)),
                         jax.device_put(tiled, batch_sharding(mesh)), key)
            outs[name] = (jax.device_get(st), m)
            assert np.isfinite(float(m["loss/g/total"]))
            # grads stay f32 in the state; only the reduction was cast
            for leaf in jax.tree.leaves(st.g_params):
                assert leaf.dtype == jnp.float32

        # AdamW's normalized update is O(lr); a 2^-8 relative rounding of
        # the gradient moves it by well under lr/16.
        lr = cfg.train.learning_rate
        for a, b in zip(jax.tree.leaves(outs["f32"][0].g_params),
                        jax.tree.leaves(outs["bf16"][0].g_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=lr / 4)

    def test_per_shard_rng_trains(self, rng):
        """Production mode: distinct per-shard data + folded rng streams;
        two chained steps stay finite and replicated."""
        from quickvc_tpu.parallel import make_sharded_train_step

        cfg, net_g, net_d, basis, host_state, _, _ = self._setup(rng)
        mesh = data_parallel_mesh(8)
        batch = jax.device_put(make_batch(cfg, rng, batch=16),
                               batch_sharding(mesh))
        step = make_sharded_train_step(cfg, net_g, net_d, basis, mesh,
                                       reduce_dtype=jnp.bfloat16)
        state = jax.device_put(host_state, replicated(mesh))
        for i in range(2):
            state, m = step(state, batch, jax.random.PRNGKey(10 + i))
            assert np.isfinite(float(m["loss/g/total"]))
            assert np.isfinite(float(m["loss/d/total"]))
        assert int(state.step) == 2
        # the replicated output really is consistent across devices
        p0 = jax.tree.leaves(state.g_params)[0]
        shards = [np.asarray(s.data) for s in p0.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


@pytest.mark.slow  # ~2 min per test cold: each runs two real run() sessions
class TestResumeTrajectory:
    """N steps straight == k steps + save/restore + (N-k) steps, BIT-exact.

    VERDICT r3 item 2: state-identity resume tests can miss silent
    optimizer-state/RNG loss (the reference's bare-except resume failure
    mode, reference train.py:61-68). The loop's design makes exactness
    cheap — the step rng is folded by global_step, crops are deterministic
    in (seed, epoch, batch index), and a mid-epoch restore fast-forwards
    the loader past already-trained batches — so the interrupted and
    uninterrupted trajectories must produce identical checkpoints, down to
    the last bit of every param and AdamW moment. k=3 with 4 batches/epoch
    exercises the MID-epoch path (resume inside epoch 1, then epoch 2).
    """

    N, K = 6, 3

    def _make_data(self, tmp_path):
        import numpy as np2
        from quickvc_tpu.data.audio_io import write_wav_int16

        g = np2.random.default_rng(0)
        paths = []
        for i in range(4):
            t = 16000 + i * 4000
            wav = (0.2 * np2.sin(2 * np2.pi * 220 * (i + 1)
                                 * np2.arange(t) / 16000)).astype(np2.float32)
            p = tmp_path / f"utt{i}.wav"
            write_wav_int16(str(p), wav, 16000)
            np2.save(str(tmp_path / f"utt{i}.npy"),
                     g.standard_normal((t // 320, 12)).astype(np2.float32))
            paths.append(str(p))
        lst = tmp_path / "train.txt"
        lst.write_text("\n".join(paths) + "\n")
        return str(lst)

    def _cfg(self, lst, run_dir, **train_overrides):
        import os
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_e2e import e2e_config

        cfg = e2e_config(lst)
        cfg.model.unit_channels = 12
        cfg.model_dir = str(run_dir)
        cfg.train.eval_interval = 0
        cfg.train.batch_size = 8
        for k, v in train_overrides.items():
            setattr(cfg.train, k, v)
        return cfg

    def _final_state(self, cfg):
        from quickvc_tpu.train.state import create_train_state
        from quickvc_tpu.utils.checkpoint import CheckpointManager

        state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        restored = CheckpointManager(cfg.model_dir).restore_latest(abstract)
        assert restored is not None
        return jax.device_get(restored[0]), restored[1]

    def _run_pair(self, tmp_path, **overrides):
        from quickvc_tpu.train.loop import run

        lst = self._make_data(tmp_path)
        cfg_a = self._cfg(lst, tmp_path / "straight", **overrides)
        run(cfg_a, max_steps=self.N)
        cfg_b = self._cfg(lst, tmp_path / "resumed", **overrides)
        run(cfg_b, max_steps=self.K)
        run(cfg_b, max_steps=self.N)  # picks up the step-K checkpoint
        import os
        log = open(os.path.join(cfg_b.model_dir, "train.log")).read()
        assert f"Resumed from checkpoint at step {self.K}" in log
        return cfg_a, cfg_b

    def _assert_identical(self, cfg_a, cfg_b):
        sa, step_a = self._final_state(cfg_a)
        sb, step_b = self._final_state(cfg_b)
        assert step_a == step_b == self.N
        la, lb = jax.tree.leaves(sa), jax.tree.leaves(sb)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gspmd_mid_epoch_resume_bitexact(self, tmp_path):
        self._assert_identical(*self._run_pair(tmp_path))

    def test_zero1_mid_epoch_resume_bitexact(self, tmp_path):
        """Same property on the ZeRO-1 sharded-optimizer layout."""
        self._assert_identical(*self._run_pair(tmp_path,
                                               zero_opt_state=True))

    def test_warm_start_resume_bitexact(self, tmp_path):
        """Warm start from a reference-layout .pth, interrupt, resume:
        identical to the uninterrupted warm-started run."""
        import numpy as np2
        import torch

        from quickvc_tpu.train.loop import run
        from test_torch_port import synth_generator_sd

        lst = self._make_data(tmp_path)
        cfg_probe = self._cfg(lst, tmp_path / "probe")
        sd = synth_generator_sd(np2.random.default_rng(3), cfg_probe.model,
                                cfg_probe.spec_channels)
        g_path = str(tmp_path / "G_synth.pth")
        torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                    "iteration": 1, "learning_rate": 2e-4, "optimizer": {}},
                   g_path)

        cfg_a = self._cfg(lst, tmp_path / "straight")
        run(cfg_a, max_steps=self.N, init_torch=(g_path, None))
        cfg_b = self._cfg(lst, tmp_path / "resumed")
        run(cfg_b, max_steps=self.K, init_torch=(g_path, None))
        run(cfg_b, max_steps=self.N, init_torch=(g_path, None))
        self._assert_identical(cfg_a, cfg_b)


class TestCompactTransfer:
    """transfer='compact' (s16 wave + halo, on-device spec) must reproduce
    the full-mode step: same crops, same wave bits, spec to host/device
    STFT rounding (~3e-4, test_dsp.py parity), losses to matching tolerance.
    """

    def _items(self, cfg, rng, n_frames=40):
        from quickvc_tpu.data.dataset import _compute_spec

        items = []
        for _ in range(2):
            n = n_frames * cfg.data.hop_length
            # s16-quantized, like every file the pipeline reads
            w16 = (rng.standard_normal(n) * 8000).astype(np.int16)
            wav = w16.astype(np.float32) / 32768.0
            items.append({
                "unit": rng.standard_normal(
                    (n_frames, cfg.model.unit_channels)).astype(np.float32),
                "spec": _compute_spec(wav, cfg),
                "wave": wav[:, None],
            })
        return items

    def _collate_pair(self, rng):
        import dataclasses

        from quickvc_tpu.data.dataset import collate_batch

        cfg_full = tiny_config()
        cfg_full = dataclasses.replace(
            cfg_full, train=dataclasses.replace(cfg_full.train,
                                                transfer="full"))
        cfg_compact = dataclasses.replace(
            cfg_full, train=dataclasses.replace(cfg_full.train,
                                                transfer="compact"))
        items = self._items(cfg_full, rng)
        full = collate_batch([{k: v.copy() for k, v in it.items()}
                              for it in items], 32, cfg_full,
                             np.random.default_rng(7))
        compact = collate_batch(
            [{k: v for k, v in it.items() if k != "spec"} for it in items],
            32, cfg_compact, np.random.default_rng(7))
        return cfg_full, cfg_compact, full, compact

    def test_collate_equivalence(self, rng):
        cfg_full, cfg_compact, full, compact = self._collate_pair(rng)
        hop = cfg_full.data.hop_length
        pad = (cfg_full.data.filter_length - hop) // 2
        # same crop draw -> identical unit content
        np.testing.assert_array_equal(full["unit"],
                                      np.asarray(compact["unit"], np.float32))
        # wave reconstructs BIT-exactly from the s16 wire format
        wf = compact["wave_s16"].astype(np.float32) / 32768.0
        wave = wf[:, pad:-pad, None]
        L = full["unit"].shape[1]
        smask = (np.arange(L * hop)[None, :]
                 < compact["n_take"][:, None] * hop)
        np.testing.assert_array_equal(full["wave"], wave * smask[..., None])
        # on-device spec from the halo == the host cached spec (STFT rounding)
        import jax
        from quickvc_tpu.dsp.stft import wave_to_spec_halo
        spec = np.asarray(jax.jit(
            lambda w: wave_to_spec_halo(w, cfg_full.data.filter_length, hop,
                                        cfg_full.data.win_length))(wf))
        fmask = (np.arange(L)[None, :] < compact["n_take"][:, None])
        np.testing.assert_allclose(full["spec"], spec * fmask[..., None],
                                   atol=3e-4, rtol=3e-4)

    def test_step_equivalence(self, rng):
        cfg_full, cfg_compact, full, compact = self._collate_pair(rng)
        state, net_g, net_d = create_train_state(cfg_full, jax.random.PRNGKey(0))
        basis = jnp.asarray(mel_filterbank(
            cfg_full.data.sampling_rate, cfg_full.data.filter_length,
            cfg_full.data.n_mel_channels))
        step_f = jax.jit(make_train_step(cfg_full, net_g, net_d, basis))
        step_c = jax.jit(make_train_step(cfg_compact, net_g, net_d, basis))
        key = jax.random.PRNGKey(5)
        host = jax.device_get(state)
        sf, mf = step_f(jax.device_put(host),
                        {k: jnp.asarray(v) for k, v in full.items()}, key)
        sc, mc = step_c(jax.device_put(host),
                        {k: jnp.asarray(v) for k, v in compact.items()}, key)
        for k in ("loss/g/total", "loss/d/total", "loss/g/mel", "loss/g/kl"):
            np.testing.assert_allclose(float(mf[k]), float(mc[k]),
                                       rtol=5e-3, atol=1e-3), k
        # params move together (same crops, same rng draws)
        da = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), sf.g_params, sc.g_params))
        assert max(da) < 2.5 * cfg_full.train.learning_rate

    def test_unit_wire_dtype_bf16(self, rng):
        """precision=bf16 + compact ships units in bf16 — exactly the dtype
        the step's g_forward casts to, so the wire is lossless."""
        import dataclasses
        import ml_dtypes

        from quickvc_tpu.data.dataset import collate_batch

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, transfer="compact",
                                           precision="bf16"))
        items = self._items(cfg, rng)
        out = collate_batch(
            [{k: v for k, v in it.items() if k != "spec"} for it in items],
            32, cfg, np.random.default_rng(7))
        assert out["unit"].dtype == np.dtype(ml_dtypes.bfloat16)
        # replicate the crop draw: stable sort keeps item order; one
        # integers() call per item, seg=33 over 40 frames -> start in [0,8)
        rng2 = np.random.default_rng(7)
        start0 = int(rng2.integers(0, 40 - 33 + 1))
        ref = items[0]["unit"][start0 : start0 + 32].astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(np.asarray(out["unit"][0]), ref)


def test_split_prior_step_trains(rng):
    """train.split_prior (enc_p in its own vjp after the D update) is a
    drop-in layout: finite losses, params move, guard metrics intact.
    Trajectories match the monolithic layout in distribution only (the
    'sample' rng stream differs), so this pins mechanics, not bits."""
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, split_prior=True))
    state, net_g, net_d = create_train_state(cfg, jax.random.PRNGKey(0))
    basis = jnp.asarray(mel_filterbank(
        cfg.data.sampling_rate, cfg.data.filter_length,
        cfg.data.n_mel_channels))
    step = jax.jit(make_train_step(cfg, net_g, net_d, basis))
    batch = make_batch(cfg, rng)
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))
    for k in ("loss/g/total", "loss/d/total", "loss/g/mel", "loss/g/kl"):
        assert np.isfinite(float(m2[k])), k
    assert float(m2["loss/g/kl"]) > 0  # the split prior really feeds the KL
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.g_params, s2.g_params)
    assert max(jax.tree.leaves(moved)) > 0
    # enc_p params specifically receive gradient through the split vjp
    pa = state.g_params["enc_p"]
    pb = s2.g_params["enc_p"]
    dm = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), pa, pb)
    assert max(jax.tree.leaves(dm)) > 0
