"""Training checkpoint/resume.

The reference checkpoints model weights only, with no optimizer/scheduler
state and no resume path (save_pretrained on best batch loss,
src/train_HAConvDR_topiocqa.py:35-45,206-208).  Here the FULL train state
(params, AdamW moments, accumulation buffer, counters) is checkpointed with
orbax so interrupted corpus-scale runs resume exactly; HF-format weight
export (models/hf_import.save_hf_checkpoint) remains the interop surface
for the best-loss snapshots.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from haconvdr_tpu.train.trainer import TrainState


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_train_state(directory: str, step: int, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    mngr = _manager(directory)
    mngr.save(step, args=ocp.args.StandardSave(state._asdict()))
    mngr.wait_until_finished()
    mngr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mngr = _manager(directory)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_train_state(
    directory: str, like: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore into the structure/shardings of ``like`` (an initialized
    TrainState, typically from init_train_state on the target mesh)."""
    import orbax.checkpoint as ocp

    mngr = _manager(directory)
    step = mngr.latest_step() if step is None else step
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, like._asdict()
    )
    restored = mngr.restore(step, args=ocp.args.StandardRestore(abstract))
    mngr.close()
    # Leave leaves uncommitted (numpy) so the jitted step re-places them
    # under its own shardings; pass a sharded `like` + device_put afterwards
    # for explicitly sharded restores at scale.
    import numpy as np

    restored = jax.tree_util.tree_map(np.asarray, restored)
    return TrainState(**restored)
