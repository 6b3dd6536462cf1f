"""Orbax checkpoint round trip for the TrainState."""

import numpy as np

import jax
import jax.numpy as jnp

from quickvc_tpu.config import DataConfig, ModelConfig, QuickVCConfig, TrainConfig
from quickvc_tpu.train import create_train_state
from quickvc_tpu.utils.checkpoint import CheckpointManager


def _tiny_cfg():
    return QuickVCConfig(
        train=TrainConfig(segment_size=2560, max_speclen=32, precision="f32",
                          disc_width=0.25),
        data=DataConfig(),
        model=ModelConfig(inter_channels=16, hidden_channels=16,
                          upsample_initial_channel=32, gin_channels=16,
                          unit_channels=12, resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3, 5),),
                          enc_wn_layers=2, flow_wn_layers=2, n_flows=2),
    )


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path))

    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    assert mgr.restore_latest(abstract) is None  # empty dir -> scratch

    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr.save(7, jax.device_get(state))
    mgr.wait()

    mgr2 = CheckpointManager(str(tmp_path))
    restored, step = mgr2.restore_latest(abstract)
    assert step == 7
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.g_params)
    b = jax.tree.leaves(restored.g_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_keeps_latest(tmp_path):
    cfg = _tiny_cfg()
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, jax.device_get(state.replace(step=jnp.asarray(s, jnp.int32))))
    mgr.wait()
    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored, step = CheckpointManager(str(tmp_path)).restore_latest(abstract)
    assert step == 3 and int(restored.step) == 3
