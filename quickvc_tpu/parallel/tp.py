"""Optional tensor parallelism: channel-dim sharding over a 2-D mesh.

SURVEY §2.2 plan: "optional ('data','model') mesh axis for conv-channel
sharding if a scaled-up config exceeds one chip". The QuickVC reference
scale (~18M-param generator) fits one chip, so this is OFF by default —
but the machinery is first-class: build a 2-D mesh, annotate the wide
conv/dense kernels with a 'model'-axis PartitionSpec on their channel dim,
and GSPMD inserts the all-gathers/reduce-scatters over ICI.

Usage:
    mesh = mesh_2d(data=2, model=4)
    shardings = param_shardings(mesh, params, min_channels=256)
    state = jax.device_put(state, replace_params_shardings(...))

The heuristic shards the OUTPUT-channel dim of kernels whose channel count
is divisible by the model-axis size and >= ``min_channels`` (the decoder's
512/256-channel convs, the WN stacks' 384-channel gates); everything else
replicates. Correctness is GSPMD's job regardless of the choice; the
heuristic just controls the compute/communication trade-off.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mesh_2d(data: int, model: int) -> Mesh:
    devices = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def _kernel_spec(path: tuple, leaf, model_size: int, min_channels: int) -> P:
    """PartitionSpec for one param leaf: shard the widest eligible dim on 'model'."""
    shape = getattr(leaf, "shape", ())
    if len(shape) == 0:
        return P()
    # Last dim is the output-channel dim for all our conv kernels ('HIO'
    # layout v/kernel) and Dense kernels; per-channel vectors (g, bias)
    # follow their conv's output dim.
    out_ch = shape[-1]
    if out_ch >= min_channels and out_ch % model_size == 0:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def param_shardings(mesh: Mesh, params, min_channels: int = 256):
    """Tree of NamedShardings: wide kernels sharded on 'model', rest replicated."""
    model_size = mesh.shape["model"]

    def one(path, leaf):
        return NamedSharding(mesh, _kernel_spec(path, leaf, model_size, min_channels))

    return jax.tree_util.tree_map_with_path(one, params)


def state_shardings(mesh: Mesh, state, min_channels: int = 256):
    """Shardings for a whole TrainState: params (and their optimizer moments)
    get the TP layout; scalars replicate."""
    rep = NamedSharding(mesh, P())

    def one(path, leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1:
            return NamedSharding(
                mesh, _kernel_spec(path, leaf, mesh.shape["model"], min_channels))
        return rep

    return jax.tree_util.tree_map_with_path(one, state)


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Batches shard over 'data' only; the 'model' axis sees full batches."""
    return NamedSharding(mesh, P("data"))
