"""Collater / sampler / config round-trip unit tests."""

import dataclasses

import numpy as np

from glow_tts_tpu.config import load_config, save_config
from glow_tts_tpu.data.collate import (TrainCollater, round_up,
                                       slice_mel_for_ge2e)
from glow_tts_tpu.data.loader import BatchSampler, DataLoader
from glow_tts_tpu.text import Tokenizer
from tests.helpers import tiny_config


def _items(n=6, mel_dim=8, seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        t_mel = int(rng.integers(11, 40))
        items.append({
            'text': 'HELLO WORLD NUMBER %s.' % ('AB'[i % 2] * (i + 1)),
            'mel': rng.standard_normal((t_mel, mel_dim)).astype(np.float32),
            'pitch': rng.random(t_mel).astype(np.float32),
            'speaker_id': i % 3,
            'speaker': f'SPK{i % 3}',
        })
    return items


def test_train_collater_bucketing_and_masks():
    cfg = tiny_config(**{'TPU': {'token_bucket': 16, 'mel_bucket': 8,
                                 'compute_dtype': 'float32'}})
    collater = TrainCollater(cfg, Tokenizer())
    batch = collater(_items())
    assert batch['tokens'].shape[1] % 16 == 0
    assert batch['mels'].shape[1] % 8 == 0
    s = cfg.decoder.num_squeeze
    assert np.all(batch['mel_lengths'] % s == 0)
    # padding values
    for i, ml in enumerate(batch['mel_lengths']):
        assert np.allclose(batch['mels'][i, ml:], -cfg.sound.max_abs_mel)
    for i, tl in enumerate(batch['token_lengths']):
        assert np.all(batch['tokens'][i, tl:] == Tokenizer().eos_id)


def test_ge2e_slicing_shapes():
    rng = np.random.default_rng(1)
    # long mel: random crop; short mel: reflect pad
    for t in (200, 10):
        mel = rng.standard_normal((t, 8)).astype(np.float32)
        sliced = slice_mel_for_ge2e(mel, samples=3, slice_length=16,
                                    overlap_length=8, rng=rng)
        assert sliced.shape == (3, 16, 8)
        # consecutive slices overlap by overlap_length
        np.testing.assert_allclose(sliced[0, 8:], sliced[1, :8])


class _FakeDataset:
    def __init__(self, lengths):
        self.lengths = lengths

    def __len__(self):
        return len(self.lengths)

    def mel_length(self, i):
        return self.lengths[i]

    def __getitem__(self, i):
        return {'length': self.lengths[i], 'index': i}


def test_batch_sampler_length_grouping():
    lengths = list(range(100, 0, -1))
    ds = _FakeDataset(lengths)
    sampler = BatchSampler(ds, batch_size=4, shuffle=True, sort_factor=4,
                           seed=0)
    batches = list(sampler)
    assert all(len(b) == 4 for b in batches)
    # within a batch, lengths should be close (sorted windows)
    spreads = [max(ds.mel_length(i) for i in b)
               - min(ds.mel_length(i) for i in b) for b in batches]
    assert np.mean(spreads) < 20   # vs ~75 expected for pure shuffling
    # different epochs give different batch orders
    second = list(sampler)
    assert any(tuple(a) != tuple(b) for a, b in zip(batches, second))


def test_loader_prefetch_and_exceptions():
    ds = _FakeDataset([5, 6, 7, 8])
    loader = DataLoader(ds, lambda items: {'n': len(items)}, batch_size=2,
                        shuffle=False, prefetch=2, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2 and all(b['n'] == 2 for b in batches)

    def boom(items):
        raise RuntimeError('collate failed')
    bad = DataLoader(ds, boom, batch_size=2, prefetch=2)
    try:
        list(bad)
        assert False, 'expected the producer exception to surface'
    except RuntimeError as e:
        assert 'collate failed' in str(e)


def test_config_snapshot_roundtrip(tmp_path):
    cfg = tiny_config(mode='GR')
    path = str(tmp_path / 'snap.yaml')
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded == cfg


def test_reference_yaml_loads_and_roundtrips(tmp_path):
    cfg = load_config('/root/reference/Hyper_Parameters.yaml')
    assert cfg.mode == 'SE'
    assert cfg.encoder.transformer.attention.window_size == 4
    assert cfg.train.train_pattern.mel_length_max == 1000
    path = str(tmp_path / 'snap.yaml')
    save_config(cfg, path)
    assert load_config(path) == cfg


def test_reference_compat_keys_map_to_tpu_section():
    """``Use_Cython_Alignment`` / ``Use_Mixed_Precision`` from the pristine
    reference YAML drive the TPU MAS backend and compute dtype
    (``Hyper_Parameters.yaml:15``, ``Train.py:42-47``)."""
    cfg = load_config('/root/reference/Hyper_Parameters.yaml')
    # reference ships Use_Cython_Alignment: true (native fast path) and
    # Use_Mixed_Precision: false (full precision)
    assert cfg.tpu.mas_backend == 'pallas'
    assert cfg.tpu.compute_dtype == 'float32'

    cfg = load_config({'Use_Cython_Alignment': False,
                       'Use_Mixed_Precision': True})
    assert cfg.tpu.mas_backend == 'scan'
    assert cfg.tpu.compute_dtype == 'bfloat16'

    # explicit TPU keys always win over the compat mapping
    cfg = load_config({'Use_Cython_Alignment': False,
                       'Use_Mixed_Precision': False,
                       'TPU': {'mas_backend': 'pallas',
                               'compute_dtype': 'bfloat16'}})
    assert cfg.tpu.mas_backend == 'pallas'
    assert cfg.tpu.compute_dtype == 'bfloat16'


def test_ge2e_batches_deterministic_across_threads():
    """GE2E slice offsets must not depend on producer-thread scheduling:
    the round-2 shared ``np.random.Generator`` both raced (numpy
    Generators are not thread-safe) and made batches depend on the order
    threads happened to collate them.  The per-batch content-derived
    generator fixes both: the same batch always slices identically."""
    import threading

    cfg = tiny_config(mode='SE', **{
        'Speaker_Embedding': {
            'Type': 'GE2E', 'Num_Speakers': 4, 'Embedding_Size': 16,
            'GE2E': {'LSTM': {'Sizes': 16, 'Stacks': 2},
                     'Inference': {'Samples': 2, 'Slice_Length': 12,
                                   'Overlap_Length': 4}}}})
    collater = TrainCollater(cfg, Tokenizer(), seed=7)
    items = _items(n=12, mel_dim=cfg.sound.mel_dim, seed=3)
    batches = [items[:4], items[4:8], items[8:]]

    reference = [collater(b)['mels_for_ge2e'] for b in batches]

    # hammer the same collater from several threads, in scrambled orders
    results = {}

    def worker(order, out_key):
        got = {}
        for bi in order:
            got[bi] = collater(batches[bi])['mels_for_ge2e']
        results[out_key] = got

    threads = [threading.Thread(target=worker,
                                args=([2, 0, 1][k:] + [2, 0, 1][:k], k))
               for k in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got in results.values():
        for bi, arr in got.items():
            np.testing.assert_array_equal(arr, reference[bi])


def test_loader_multi_worker_produces_all_batches():
    """Parallel producer threads must yield every batch exactly once and
    still surface producer exceptions (order may interleave)."""
    from glow_tts_tpu.data.loader import DataLoader

    class SeqDataset(list):
        pass

    dataset = SeqDataset(range(40))

    def collater(items):
        return {'ids': np.asarray(sorted(items))}

    loader = DataLoader(dataset, collater, batch_size=4, shuffle=True,
                        seed=3, prefetch=4, workers=3, drop_last=False)
    seen = []
    for batch in loader:
        seen.extend(batch['ids'].tolist())
    assert sorted(seen) == list(range(40))

    def bad_collater(items):
        raise RuntimeError('collate failed in worker')

    loader = DataLoader(dataset, bad_collater, batch_size=4, shuffle=False,
                        prefetch=4, workers=3)
    try:
        list(iter(loader))
        assert False, 'expected the worker exception to surface'
    except RuntimeError as e:
        assert 'collate failed' in str(e)
