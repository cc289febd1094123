"""Batch assembly: padding, shape bucketing, GE2E slicing.

Reference semantics preserved (``Datasets.py:23-74, 225-287``):
* tokens padded with ``<E>``, mels with −max_abs_mel, pitch with 0
* mels truncated to a multiple of ``num_squeeze`` *before* length capture
* GE2E input = ``samples`` overlapping ``slice_length``-frame windows per
  utterance (reflect-padded when short), stacked to [B·S, T_slice, M]

TPU-first difference: padded shapes are rounded **up to bucket multiples**
(``config.tpu.token_bucket`` / ``mel_bucket``) so XLA sees a small fixed set
of shapes instead of one compilation per batch-max length — the reference's
pad-to-batch-max (``Datasets.py:24,33``) would trigger constant recompiles
under jit.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from glow_tts_tpu.config import Config
from glow_tts_tpu.text import Tokenizer


def round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def batch_rng(seed: int, items: Sequence[Dict],
              mel_key: str = 'mel') -> np.random.Generator:
    """Deterministic per-batch generator for GE2E slice offsets.

    numpy ``Generator`` objects are not thread-safe, and ``DataLoader``
    calls one collater from several producer threads — a single shared
    generator (the round-2 design) could corrupt its state under
    ``workers > 1``.  Instead every ``__call__`` derives a fresh generator
    from the collater seed plus a fingerprint of the batch content
    (mel lengths + speaker ids), so offsets are race-free AND identical no
    matter which thread assembles the batch or in which order batches are
    produced.  Epoch-to-epoch freshness comes from the sampler reshuffling
    batch composition (different fingerprint → different offsets), matching
    the reference's fresh-random slicing intent (``Datasets.py:41-65``).
    """
    fingerprint = [np.uint32(seed) & 0xFFFFFFFF]
    for item in items:
        mel = item.get(mel_key)
        if mel is not None:
            fingerprint.append(mel.shape[0])
        fingerprint.append(int(item.get('speaker_id', 0)))
    return np.random.default_rng(np.random.SeedSequence(fingerprint))


def slice_mel_for_ge2e(mel: np.ndarray, samples: int, slice_length: int,
                       overlap_length: int,
                       rng: np.random.Generator) -> np.ndarray:
    """[T, M] → [samples, slice_length, M] overlapping windows."""
    required = samples * (slice_length - overlap_length) + overlap_length
    if mel.shape[0] > required:
        offset = int(rng.integers(0, mel.shape[0] - required))
        mel = mel[offset:offset + required]
    else:
        pad = (required - mel.shape[0]) / 2
        mel = np.pad(mel, [[int(np.floor(pad)), int(np.ceil(pad))], [0, 0]],
                     mode='reflect')
    step = slice_length - overlap_length
    return np.stack([mel[i * step:i * step + slice_length]
                     for i in range(samples)])


class TrainCollater:
    """Items → fixed-shape numpy batch dict."""

    def __init__(self, config: Config, tokenizer: Tokenizer,
                 seed: int = 0):
        self.config = config
        self.tokenizer = tokenizer
        self.seed = seed

    def __call__(self, items: Sequence[Dict]) -> Dict[str, np.ndarray]:
        cfg = self.config
        s = cfg.decoder.num_squeeze
        tokens = [self.tokenizer.encode(item['text']) for item in items]
        mels = [item['mel'][:item['mel'].shape[0] // s * s]
                for item in items]
        pitches = [item['pitch'] for item in items]

        token_lengths = np.array([t.shape[0] for t in tokens], np.int32)
        mel_lengths = np.array([m.shape[0] for m in mels], np.int32)

        t_tok = round_up(int(token_lengths.max()), cfg.tpu.token_bucket)
        t_mel = round_up(int(mel_lengths.max()), cfg.tpu.mel_bucket)

        batch = len(items)
        token_pad = np.full((batch, t_tok), self.tokenizer.eos_id, np.int32)
        mel_pad = np.full((batch, t_mel, cfg.sound.mel_dim),
                          -cfg.sound.max_abs_mel, np.float32)
        pitch_pad = np.zeros((batch, t_mel), np.float32)
        for i, (tk, mel, pitch) in enumerate(zip(tokens, mels, pitches)):
            token_pad[i, :tk.shape[0]] = tk
            mel_pad[i, :mel.shape[0]] = mel
            # pitch aligned to the (truncated) mel timeline
            n = min(pitch.shape[0], mel.shape[0])
            pitch_pad[i, :n] = pitch[:n]

        out = {
            'tokens': token_pad,
            'token_lengths': token_lengths,
            'mels': mel_pad,
            'mel_lengths': mel_lengths,
        }
        if self.config.uses_speaker_embedding or \
                self.config.uses_gradient_reversal:
            out['speakers'] = np.array(
                [item['speaker_id'] for item in items], np.int32)
            if cfg.speaker_embedding.type.upper() == 'GE2E':
                ge2e = cfg.speaker_embedding.ge2e.inference
                rng = batch_rng(self.seed, items)
                out['mels_for_ge2e'] = np.concatenate([
                    slice_mel_for_ge2e(item['mel'], ge2e.samples,
                                       ge2e.slice_length,
                                       ge2e.overlap_length, rng)
                    for item in items]).astype(np.float32)
        if self.config.uses_gradient_reversal:
            out['pitches'] = pitch_pad
        return out


class InferenceCollater:
    """Inference specs (+ optional reference-wav features) → batch dict."""

    def __init__(self, config: Config, tokenizer: Tokenizer):
        self.config = config
        self.tokenizer = tokenizer
        self.seed = 0

    def __call__(self, items: Sequence[Dict]) -> Dict[str, np.ndarray]:
        cfg = self.config
        tokens, token_lengths = self.tokenizer.encode_batch(
            [item['text'] for item in items])
        t_tok = round_up(tokens.shape[1], cfg.tpu.token_bucket)
        tokens = np.pad(tokens, ((0, 0), (0, t_tok - tokens.shape[1])),
                        constant_values=self.tokenizer.eos_id)
        out = {
            'tokens': tokens,
            'token_lengths': token_lengths,
            'length_scales': np.array(
                [item.get('length_scale', 1.0) for item in items],
                np.float32),
        }
        if cfg.uses_speaker_embedding and \
                cfg.speaker_embedding.type.upper() == 'LUT':
            out['speakers'] = np.array(
                [item['speaker_id'] for item in items], np.int32)
        if cfg.uses_speaker_embedding and \
                cfg.speaker_embedding.type.upper() == 'GE2E':
            ge2e = cfg.speaker_embedding.ge2e.inference
            rng = batch_rng(self.seed, items, mel_key='mel_for_ge2e')
            out['mels_for_ge2e'] = np.concatenate([
                slice_mel_for_ge2e(item['mel_for_ge2e'], ge2e.samples,
                                   ge2e.slice_length, ge2e.overlap_length,
                                   rng)
                for item in items]).astype(np.float32)
        if cfg.uses_prosody_encoder:
            mels = [item['mel_for_prosody'] for item in items]
            lengths = np.array([m.shape[0] for m in mels], np.int32)
            t_mel = round_up(int(lengths.max()), cfg.tpu.mel_bucket)
            padded = np.full((len(items), t_mel, cfg.sound.mel_dim),
                             -cfg.sound.max_abs_mel, np.float32)
            for i, m in enumerate(mels):
                padded[i, :m.shape[0]] = m
            out['mels_for_prosody'] = padded
            out['mel_lengths_for_prosody'] = lengths
        if cfg.uses_gradient_reversal:
            pitches = [item['pitch'] for item in items]
            lengths = np.array([p.shape[0] for p in pitches], np.int32)
            t_pitch = round_up(int(lengths.max()), cfg.tpu.mel_bucket)
            padded = np.zeros((len(items), t_pitch), np.float32)
            for i, p in enumerate(pitches):
                padded[i, :p.shape[0]] = p
            out['pitches'] = padded
            out['pitch_lengths'] = lengths
        return out


class ProsodyCheckCollater:
    def __init__(self, config: Config):
        self.config = config

    def __call__(self, items: Sequence[Dict]):
        cfg = self.config
        mels = [item['mel'] for item in items]
        lengths = np.array([m.shape[0] for m in mels], np.int32)
        t_mel = round_up(int(lengths.max()), cfg.tpu.mel_bucket)
        padded = np.full((len(items), t_mel, cfg.sound.mel_dim),
                         -cfg.sound.max_abs_mel, np.float32)
        for i, m in enumerate(mels):
            padded[i, :m.shape[0]] = m
        return {
            'mels': padded,
            'mel_lengths': lengths,
            'labels': [item['speaker'] for item in items],
        }
