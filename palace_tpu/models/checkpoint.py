"""Orbax checkpoint/resume for GCN training state.

The reference pipeline checkpoints only stage artifacts on disk
(palace:121-149 skip-if-exists); its model is a fixed pre-trained
``.pt`` with no training code.  Our training capability
(models/train.py) gets real TPU-native checkpointing: the full
TrainState pytree (params + optimizer state + step) saved with orbax,
sharding-aware on restore (arrays come back with the shardings of the
template state, so a dp×tp-sharded run resumes sharded).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from palace_tpu.models.train import TrainState
from palace_tpu.utils.logging import get_logger

logger = get_logger("palace")


def _manager(ckpt_dir: str | Path, max_to_keep: int = 3) -> ocp.CheckpointManager:
    path = Path(ckpt_dir).resolve()
    path.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(path, options=options)


def save_train_state(ckpt_dir: str | Path, state: TrainState,
                     max_to_keep: int = 3) -> int:
    """Save ``state`` under its own step number; returns that step."""
    step = int(jax.device_get(state.step))
    with _manager(ckpt_dir, max_to_keep) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()
    logger.info("Saved training checkpoint step=%d → %s", step, ckpt_dir)
    return step


def latest_step(ckpt_dir: str | Path) -> Optional[int]:
    path = Path(ckpt_dir)
    if not path.exists():
        return None
    with _manager(path) as mngr:
        return mngr.latest_step()


def restore_train_state(ckpt_dir: str | Path, template: TrainState,
                        step: Optional[int] = None) -> Optional[TrainState]:
    """Restore the latest (or a specific) checkpoint.  ``template``
    supplies the pytree structure and target shardings; None when the
    directory holds no checkpoint."""
    with _manager(ckpt_dir) as mngr:
        step = mngr.latest_step() if step is None else step
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        restored = mngr.restore(step, args=ocp.args.StandardRestore(abstract))
    logger.info("Restored training checkpoint step=%d from %s", step, ckpt_dir)
    return TrainState(*restored) if not isinstance(restored, TrainState) else restored
