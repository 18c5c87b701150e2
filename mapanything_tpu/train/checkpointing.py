"""Checkpoint save/load/resume built on orbax.

Parity: ``mapanything/utils/train_tools.py:549-628`` (save_model/load_model
persisting model, optimizer state, epoch, best-so-far) and the cadence
logic of ``training.py:237-287`` (save_freq / keep_freq / best). Orbax
handles async sharded array IO — the TPU-native replacement for
torch.save of CPU state dicts.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with last/best/keep-every-N semantics."""

    def __init__(self, directory: str, keep_freq: int = 0, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep_freq = keep_freq

        def keep_fn(info) -> bool:
            return self.keep_freq > 0 and info.step % self.keep_freq == 0

        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            should_keep_fn=keep_fn if keep_freq else None,
            enable_async_checkpointing=True,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)
        self._meta_path = self.directory / "train_meta.json"

    def save(self, step: int, state, metadata: Optional[dict] = None):
        """Async-save the train state pytree (+ host metadata)."""
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if metadata is not None:
            tmp = self._meta_path.with_suffix(".tmp")
            with open(tmp, "w") as f:
                json.dump({"step": step, **metadata}, f)
            os.replace(tmp, self._meta_path)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the given abstract/concrete pytree template."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def load_metadata(self) -> Optional[dict]:
        if self._meta_path.exists():
            with open(self._meta_path) as f:
                return json.load(f)
        return None

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()
