"""Inference artifact export: per-utterance PNG figures and NPY arrays
(capability of reference ``Train.py:391-443`` / ``Inference.py:171-223``)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def export_mel_figure(path: str, mel: np.ndarray,
                      attention: Optional[np.ndarray] = None,
                      title: str = '') -> None:
    """mel [T, M] (plotted transposed, mel-dim vertical); attention
    [T_tok, T_mel]."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    rows = 2 if attention is not None else 1
    fig = plt.figure(figsize=(12, 4 * rows))
    plt.subplot(rows, 1, 1)
    plt.imshow(np.asarray(mel).T, aspect='auto', origin='lower')
    plt.title(f'Mel  {title}')
    plt.colorbar()
    if attention is not None:
        plt.subplot(rows, 1, 2)
        plt.imshow(np.asarray(attention), aspect='auto', origin='lower')
        plt.title('Attention')
        plt.colorbar()
    plt.tight_layout()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def export_npy(base_dir: str, label: str, mel: np.ndarray,
               attention: Optional[np.ndarray] = None) -> None:
    """NPY tree layout: <base>/NPY/Mel/<label>.npy (+ Attention/...)
    — mel saved transposed [M, T] like the reference."""
    mel_dir = os.path.join(base_dir, 'NPY', 'Mel')
    os.makedirs(mel_dir, exist_ok=True)
    np.save(os.path.join(mel_dir, f'{label}.npy'),
            np.asarray(mel).T.astype(np.float32))
    if attention is not None:
        attn_dir = os.path.join(base_dir, 'NPY', 'Attention')
        os.makedirs(attn_dir, exist_ok=True)
        np.save(os.path.join(attn_dir, f'{label}.npy'),
                np.asarray(attention).astype(np.float32))
