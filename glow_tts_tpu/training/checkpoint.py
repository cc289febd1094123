"""Checkpoint save/restore via orbax.

Semantics preserved from the reference (``Train.py:499-568``, SURVEY §2.29):
* step-indexed checkpoints; resume with ``step=0`` picks the **latest**
* model params, optimizer state, step counter and RNG are all saved
* a config snapshot is written next to the checkpoints
* ActNorm's initialised-state needs no special flag — the statistics are
  ordinary parameters here (the reference must force ``initialized=True``
  on load, ``Train.py:527-528``)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from glow_tts_tpu.config import Config, save_config
from glow_tts_tpu.training.step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, config: Optional[Config] = None,
                 max_to_keep: Optional[int] = None):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                create=True, max_to_keep=max_to_keep))
        self.directory = directory
        self._config = config
        if config is not None:
            snapshot = os.path.join(directory, 'Hyper_Parameters.yaml')
            if not os.path.exists(snapshot):
                save_config(config, snapshot)

    def save(self, step: int, state: TrainState, wait: bool = False) -> None:
        self._manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._manager.wait_until_finished()

    def restore(self, state_template: TrainState,
                step: int = 0) -> Optional[tuple]:
        """Restore (state, step); ``step=0`` → latest. Returns None if no
        checkpoint exists."""
        target = step if step else self._manager.latest_step()
        if target is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_template)
        try:
            restored = self._manager.restore(
                target, args=ocp.args.StandardRestore(abstract))
        except Exception:
            # em_stats tree-structure mismatch between the stored
            # checkpoint and the current template: resuming a pre-em
            # checkpoint under an 'em' config, or toggling the warmup
            # mode off between runs (ADVICE r4).  ``em_stats=None`` is
            # an EMPTY pytree node, so StandardRestore's structure match
            # fails in both directions; retry against the stored shape
            # and graft the template's em_stats policy back on.
            restored = self._restore_with_other_em_stats(
                target, abstract, state_template)
        return restored, target

    def _restore_with_other_em_stats(self, target, abstract,
                                     state_template):
        import warnings
        if state_template.em_stats is not None:
            # stored checkpoint predates / lacks em_stats → restore
            # without it, keep the template's freshly-initialised table
            # statistics (the EM warmup re-pools within ~1/(1-decay)
            # batches, see config.train.em_stats_decay).
            restored = self._manager.restore(
                target,
                args=ocp.args.StandardRestore(
                    abstract.replace(em_stats=None)))
            warnings.warn(
                'checkpoint has no em_stats; resuming with '
                'freshly-initialised EM table statistics')
            return restored.replace(em_stats=state_template.em_stats)
        if self._config is not None:
            # stored checkpoint carries em_stats but the current config
            # does not run the 'em' warmup → restore with the
            # config-derived stats shapes, then drop them.
            from glow_tts_tpu.training.step import init_em_stats
            stats_abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct,
                init_em_stats(self._config))
            restored = self._manager.restore(
                target,
                args=ocp.args.StandardRestore(
                    abstract.replace(em_stats=stats_abstract)))
            warnings.warn(
                'checkpoint carries em_stats the current config does '
                'not use; dropping them')
            return restored.replace(em_stats=None)
        raise

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def wait(self) -> None:
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.close()
