"""Warm-start (fine-tune) from reference-layout torch checkpoints.

The reference's resume path (train.py:61-68 + utils.py:147-193) loads the
newest ``G_*.pth``/``D_*.pth`` from the model dir; its Colab fine-tunes from
the shipped ``G_1200000.pth``. These tests pin our equivalent:
``warm_start_from_torch`` ports the params exactly and resumes the step
counter, and ``train.loop.run`` picks the files up automatically.
"""

import os

import numpy as np
import pytest

import jax

from quickvc_tpu.train import create_train_state
from quickvc_tpu.train.state import warm_start_from_torch
from quickvc_tpu.utils.checkpoint import CheckpointManager
from quickvc_tpu.utils.torch_export import (
    export_discriminator,
    export_generator,
    save_reference_checkpoint,
)
from quickvc_tpu.utils.torch_port import (
    latest_torch_checkpoint,
    port_discriminator,
    port_generator,
    to_jax,
)

from test_e2e import e2e_config, synth_dataset  # noqa: F401 (fixture)


def _save_reference_pair(state, cfg, out_dir: str, iteration: int):
    g_path = os.path.join(out_dir, f"G_{iteration}.pth")
    d_path = os.path.join(out_dir, f"D_{iteration}.pth")
    sd_g = export_generator(state.g_params, cfg.model)
    sd_d = export_discriminator(state.d_params)
    save_reference_checkpoint(g_path, sd_g, iteration, 2e-4)
    save_reference_checkpoint(d_path, sd_d, iteration, 2e-4)
    return g_path, d_path, sd_g, sd_d


def assert_trees_equal(got, want):
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got, want)


def test_warm_start_ports_params_and_iteration(tmp_path, synth_dataset):  # noqa: F811
    cfg = e2e_config(synth_dataset)
    cfg.model_dir = str(tmp_path)
    state_a, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    g_path, d_path, sd_g, sd_d = _save_reference_pair(state_a, cfg, str(tmp_path), 3)

    state_b, _, _ = create_train_state(cfg, jax.random.PRNGKey(1))
    state_b, it = warm_start_from_torch(state_b, cfg, g_path, d_path)
    assert it == 3 and int(state_b.step) == 3
    assert_trees_equal(state_b.g_params, to_jax(port_generator(sd_g, cfg.model)))
    assert_trees_equal(state_b.d_params, to_jax(port_discriminator(sd_d)))
    # fresh optimizers, zero moments (torch moments are not portable)
    assert all(float(np.abs(np.asarray(x)).max() if np.asarray(x).size else 0) == 0
               for x in jax.tree.leaves(state_b.g_opt.inner_state[0].mu))


def test_warm_start_g_only_keeps_scratch_d(tmp_path, synth_dataset):  # noqa: F811
    cfg = e2e_config(synth_dataset)
    state_a, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    g_path, _, sd_g, _ = _save_reference_pair(state_a, cfg, str(tmp_path), 8)
    state_b, _, _ = create_train_state(cfg, jax.random.PRNGKey(1))
    d_before = state_b.d_params
    state_b, it = warm_start_from_torch(state_b, cfg, g_path, None)
    assert it == 8
    assert_trees_equal(state_b.g_params, to_jax(port_generator(sd_g, cfg.model)))
    assert_trees_equal(state_b.d_params, d_before)


def test_warm_start_rejects_mismatched_config(tmp_path, synth_dataset):  # noqa: F811
    cfg = e2e_config(synth_dataset)
    state_a, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    g_path, d_path, _, _ = _save_reference_pair(state_a, cfg, str(tmp_path), 0)

    cfg_wide = e2e_config(synth_dataset)
    cfg_wide.model.hidden_channels = 24
    state_c, _, _ = create_train_state(cfg_wide, jax.random.PRNGKey(2))
    with pytest.raises(ValueError, match="shape mismatch"):
        warm_start_from_torch(state_c, cfg_wide, g_path, d_path)


def test_latest_torch_checkpoint_numeric_sort(tmp_path):
    for step in (999999, 1200000, 7):
        (tmp_path / f"G_{step}.pth").write_bytes(b"")
    assert latest_torch_checkpoint(str(tmp_path), "G_").endswith("G_1200000.pth")
    assert latest_torch_checkpoint(str(tmp_path), "D_") is None


def test_run_exports_torch_checkpoints_midrun(tmp_path, synth_dataset):  # noqa: F811
    """train.export_torch_every drops loadable reference-layout .pth files
    during training (reference train.py:181-186 cadence)."""
    from quickvc_tpu.train.loop import run
    from quickvc_tpu.utils.torch_port import load_torch_state_dict

    cfg = e2e_config(synth_dataset)
    cfg.model_dir = str(tmp_path / "run")
    os.makedirs(cfg.model_dir)
    cfg.train.eval_interval = 0
    cfg.train.batch_size = 8
    cfg.train.export_torch_every = 2
    run(cfg, max_steps=3)

    for step in (0, 2):
        for prefix, port in (("G_", lambda sd: port_generator(sd, cfg.model)),
                             ("D_", port_discriminator)):
            path = os.path.join(cfg.model_dir, f"{prefix}{step}.pth")
            assert os.path.exists(path), path
            ported = to_jax(port(load_torch_state_dict(path)))
            assert all(np.isfinite(np.asarray(x)).all()
                       for x in jax.tree.leaves(ported))
    assert latest_torch_checkpoint(cfg.model_dir, "G_").endswith("G_2.pth")


def test_run_warm_starts_from_model_dir(tmp_path, synth_dataset):  # noqa: F811
    """run() with reference .pth files in model_dir fine-tunes from them:
    starts at the checkpoint iteration, proceeds finite, checkpoints orbax."""
    from quickvc_tpu.train.loop import run

    cfg = e2e_config(synth_dataset)
    cfg.model_dir = str(tmp_path / "run")
    os.makedirs(cfg.model_dir)
    cfg.train.eval_interval = 0  # no eval/orbax churn mid-run
    cfg.train.log_interval = 1
    cfg.train.batch_size = 8  # divisible over the 8 virtual test devices
    state_a, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    _save_reference_pair(state_a, cfg, cfg.model_dir, 3)

    run(cfg, max_steps=5)
    # run's logger doesn't propagate (duplicate-line guard); check its file.
    train_log = open(os.path.join(cfg.model_dir, "train.log")).read()
    assert "Warm-started from torch checkpoint" in train_log

    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            state_a)
    restored = CheckpointManager(cfg.model_dir).restore_latest(abstract)
    assert restored is not None
    state, step = restored
    assert step == 5 and int(state.step) == 5  # 3 (warm start) + 2 steps
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.g_params))
