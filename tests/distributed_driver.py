"""Two-process distributed training driver (launched by test_distributed.py).

Runs the REAL multi-host path: ``jax.distributed.initialize`` (the same call
``train.py --distributed`` makes), then ``train.loop.run`` — per-host sampler
sharding, global-batch assembly via make_array_from_process_local_data,
GSPMD gradient psum over the 8-device mesh, multi-host orbax save/restore.

Usage: distributed_driver.py <port> <process_id> <config.json> <max_steps...>

Each max_steps value is a separate run() call, so ``2 4`` exercises both the
scratch start and the cross-process checkpoint resume. Prints a final
``DRIVER pid=<i> step=<s> gsum=<checksum>`` line for the test to compare
across processes.
"""

import os
import sys

port, pid, cfg_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
step_targets = [int(s) for s in sys.argv[4:]]

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4, (
    jax.device_count(), jax.local_device_count())
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from quickvc_tpu.config import load_config  # noqa: E402
from quickvc_tpu.train.loop import run  # noqa: E402

cfg = load_config(cfg_path)
for ms in step_targets:
    run(cfg, max_steps=ms)

# Cross-process identity check: restore the final checkpoint (host-local
# numpy abstract) and print a parameter checksum.
from quickvc_tpu.train.state import create_train_state  # noqa: E402
from quickvc_tpu.utils.checkpoint import CheckpointManager  # noqa: E402

import hashlib  # noqa: E402

state, _, _ = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
restored = CheckpointManager(cfg.model_dir).restore_latest(
    jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
assert restored is not None
st, step = restored
gsum = float(sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(st.g_params)))
assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(st.g_params))
# Bit-exact digest of the ENTIRE restored state (params + both AdamW opt
# states + step counters): the trajectory-equivalence assertion compares it
# between a straight run and a save/restore-split run across processes.
h = hashlib.sha256()
for leaf in jax.tree.leaves(st):
    h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
print(f"DRIVER pid={pid} step={step} gsum={gsum:.6e} "
      f"shash={h.hexdigest()}", flush=True)
