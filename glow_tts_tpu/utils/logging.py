"""TensorBoard observability (capability surface of reference ``Logger.py``
+ ``Train.py`` logging: scalar dicts, matplotlib image summaries, parameter
histograms, embedding projector) plus step-time / throughput tracking the
reference lacks (SURVEY §5)."""

from __future__ import annotations

import logging
import time
from typing import Dict, Mapping, Optional, Sequence

import numpy as np

logger = logging.getLogger('glow_tts_tpu')


class SummaryLogger:
    """Thin wrapper over tensorboardX with dict-level helpers."""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(log_dir)

    def add_scalars(self, scalars: Mapping[str, float], step: int) -> None:
        for tag, value in scalars.items():
            self.writer.add_scalar(tag, float(np.asarray(value)), step)

    def add_images(self, images: Mapping[str, np.ndarray], step: int,
                   origin_lower: bool = True) -> None:
        """Render each [H, W] array as a matplotlib figure summary."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        for tag, data in images.items():
            fig = plt.figure(figsize=(10, 4))
            plt.imshow(np.asarray(data), aspect='auto',
                       origin='lower' if origin_lower else 'upper')
            plt.colorbar()
            plt.title(tag)
            plt.tight_layout()
            self.writer.add_figure(tag.replace('.', '/'), fig, step)
            plt.close(fig)

    def add_histograms(self, params, step: int, prefix: str = '') -> None:
        import jax
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            tag = prefix + '/'.join(
                str(getattr(p, 'key', getattr(p, 'name', p))) for p in path)
            self.writer.add_histogram(tag.replace('.', '_'),
                                      np.asarray(leaf), step)

    def add_embedding(self, embeddings: np.ndarray,
                      labels: Sequence[str], step: int,
                      tag: str = 'embedding') -> None:
        self.writer.add_embedding(np.asarray(embeddings),
                                  metadata=list(labels),
                                  global_step=step, tag=tag)

    def close(self) -> None:
        self.writer.close()


class StepTimer:
    """Step-time / throughput metrics (frames per second per chip).

    ``add_frames`` accumulates per-step work; ``tick(steps)`` converts the
    elapsed interval into per-step time and frames/sec."""

    def __init__(self):
        self._last: Optional[float] = None
        self._frames: int = 0

    def add_frames(self, frames: int) -> None:
        self._frames += int(frames)

    def tick(self, steps: int = 1) -> Dict[str, float]:
        now = time.perf_counter()
        metrics: Dict[str, float] = {}
        if self._last is not None and steps > 0:
            dt = now - self._last
            metrics['step_time_sec'] = dt / steps
            if self._frames:
                metrics['mel_frames_per_sec'] = self._frames / dt
        self._last = now
        self._frames = 0
        return metrics

    def reset(self):
        self._last = None
        self._frames = 0
