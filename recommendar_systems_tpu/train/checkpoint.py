"""Checkpoint / resume via Orbax.

The reference's checkpointing is vestigial — ``checkpoint_dir`` exists in
config (`/root/reference/src/configs/overall.yaml:12`) but no model state is
ever saved (SURVEY.md §5).  This module adds real capability: full training
state (params, optimizer state, persistent model buffers, epoch counter,
best-metric bookkeeping) saved per epoch with retention, and exact resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        params,
        opt_state,
        net_state,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        payload = {
            "params": params,
            "opt_state": opt_state,
            "net_state": net_state,
            "extra": extra or {},
        }
        self.manager.save(step, args=self._ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
