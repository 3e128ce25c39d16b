"""Checkpoint save/restore (orbax), replacing the reference's three ad-hoc
mechanisms (Lightning ModelCheckpoint / HF hub push / raw torch.save —
SURVEY section 5). Static graph arrays are never part of the saved state,
matching the reference's persistent=False buffer rule
(reference gencast/denoiser.py:341-345) by construction: graphs live on the
model handle, not in the parameter pytree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state: Any, max_to_keep: int = 3) -> None:
    """Save a pytree `state` (e.g. {'params': ..., 'opt_state': ...})."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(
    ckpt_dir: str, step: Optional[int] = None, template: Any = None
) -> tuple[int, Any]:
    """Restore (step, state); latest step when `step` is None.

    `template` (an abstract or concrete pytree of the same structure)
    restores with correct shardings/dtypes.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"No checkpoints found in {ckpt_dir}")
    if template is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    else:
        state = mgr.restore(step)
    mgr.close()
    return step, state
