"""Prosody (GST) embedding visualisation.

A working replacement for the reference's stale ``Prosody_Visualization.py``
(SURVEY §2.33 — it imports modules that don't exist in that repo): embeds
the prosody-check dataset with a trained PE/GR checkpoint, projects with
t-SNE and renders a per-speaker scatter.

CLI: python -m glow_tts_tpu.utils.prosody_viz -c <checkpoint_dir> -o out.png
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np


def embed_prosody_dataset(checkpoint_path: str,
                          config=None,
                          step: int = 0,
                          batch_size: int = 16,
                          max_items: Optional[int] = None):
    """Returns (embeddings [N, P], speaker labels [N])."""
    import jax
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.data.collate import ProsodyCheckCollater
    from glow_tts_tpu.data.loader import DataLoader
    from glow_tts_tpu.data.patterns import ProsodyCheckDataset
    from glow_tts_tpu.inference import Inferencer

    inferencer = Inferencer(checkpoint_path, config=config, step=step)
    cfg = inferencer.config
    if not cfg.uses_prosody_encoder:
        raise ValueError('prosody visualisation needs PE or GR mode')

    dataset = ProsodyCheckDataset(
        pattern_path=cfg.train.eval_pattern.path,
        metadata_file=cfg.train.eval_pattern.metadata_file,
        mel_length_min=cfg.train.eval_pattern.mel_length_min,
        mel_length_max=cfg.train.eval_pattern.mel_length_max)
    if max_items:
        dataset.files = dataset.files[:max_items]
    loader = DataLoader(dataset, ProsodyCheckCollater(cfg), batch_size,
                        shuffle=False, prefetch=0, drop_last=False)
    embeddings, labels = [], []
    for batch in loader:
        out = inferencer.model.apply(
            {'params': inferencer.state.params},
            batch['mels'], batch['mel_lengths'],
            method='encode_prosody')
        embeddings.append(np.asarray(out))
        labels.extend(batch['labels'])
    return np.concatenate(embeddings), labels


def plot_embeddings(embeddings: np.ndarray, labels: Sequence[str],
                    out_path: str, perplexity: float = 30.0) -> None:
    from sklearn.manifold import TSNE
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    if len(labels) < 4:
        # too few samples for t-SNE: plot the first two embedding dims
        projected = embeddings[:, :2]
    else:
        perplexity = min(perplexity, len(labels) - 1)
        projected = TSNE(n_components=2, perplexity=perplexity,
                         init='pca', random_state=0).fit_transform(embeddings)

    speakers = sorted(set(labels))
    cmap = plt.get_cmap('tab20', max(len(speakers), 1))
    fig = plt.figure(figsize=(10, 10))
    for idx, speaker in enumerate(speakers):
        sel = np.array([l == speaker for l in labels])
        plt.scatter(projected[sel, 0], projected[sel, 1], s=8,
                    color=cmap(idx % 20), label=speaker)
    if len(speakers) <= 25:
        plt.legend(fontsize=7, markerscale=2)
    plt.title(f'GST prosody embeddings (t-SNE) — {len(speakers)} speakers')
    plt.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--checkpoint', required=True)
    parser.add_argument('-s', '--step', default=0, type=int)
    parser.add_argument('-o', '--output', default='prosody_tsne.png')
    parser.add_argument('-b', '--batch_size', default=16, type=int)
    parser.add_argument('-n', '--max_items', default=None, type=int)
    args = parser.parse_args()

    embeddings, labels = embed_prosody_dataset(
        args.checkpoint, step=args.step, batch_size=args.batch_size,
        max_items=args.max_items)
    plot_embeddings(embeddings, labels, args.output)
    print(f'{embeddings.shape[0]} embeddings → {args.output}')


if __name__ == '__main__':
    main()
