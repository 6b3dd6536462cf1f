"""Parallelism layer: device mesh + sharding helpers.

The reference's distributed story is a vestigial world_size=1 NCCL stub
(reference train.py:29-31, SURVEY.md §2.2). Here data parallelism is
first-class and TPU-native: a 1-D ``('data',)`` mesh, batches sharded over
it with NamedSharding, parameters replicated, and gradient reduction done
by the XLA collectives GSPMD inserts over ICI — no explicit communication
code anywhere.
"""

from quickvc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    replicated,
    shard_batch,
    zero1_state_sharding,
)
from quickvc_tpu.parallel.shard_step import (  # noqa: F401
    make_sharded_train_step,
)
