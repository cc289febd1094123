"""Integration: ETL → pattern archive → Trainer (checkpoint/resume/eval/
inference artifacts) → Inferencer, all on a synthetic miniature corpus."""

import os
import pickle

import numpy as np
import pytest

from glow_tts_tpu.config import load_config
from tests.helpers import tiny_config

TEXTS = [
    'THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG.',
    'PACK MY BOX WITH FIVE DOZEN LIQUOR JUGS, PLEASE!',
    'HOW VEXINGLY QUICK DAFT ZEBRAS JUMP TODAY?',
    "SPHINX OF BLACK QUARTZ, JUDGE MY VOW AND SMILE.",
    'A SHINING CRESCENT FAR BENEATH THE FLYING VESSEL.',
    'BRIGHT VIXENS JUMP WHILE DOZY FOWL QUACK LOUDLY.',
]


def _sound_overrides():
    return {'Sound': {
        'Mel_Dim': 8, 'Spectrogram_Dim': 65, 'Frame_Length': 64,
        'Frame_Shift': 16, 'Sample_Rate': 1600, 'Mel_F_Min': 50,
        'Mel_F_Max': 600, 'Max_Abs_Mel': 4, 'Confidence_Threshold': 0.6,
        'Gaussian_Smoothing_Sigma': 0.0, 'Pitch_Min': 100.0,
        'Pitch_Max': 400.0}}


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    """LJ-layout miniature corpus of sine-wave 'speech'."""
    from scipy.io import wavfile
    root = tmp_path_factory.mktemp('corpus')
    wav_dir = root / 'wavs'
    wav_dir.mkdir()
    sr = 1600
    lines = []
    rng = np.random.default_rng(0)
    for i, text in enumerate(TEXTS):
        dur = 1.0 + 0.25 * i
        t = np.arange(int(sr * dur)) / sr
        freq = 150 + 30 * i
        audio = (0.5 * np.sin(2 * np.pi * freq * t)
                 + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
        wavfile.write(wav_dir / f'UTT{i:03d}.wav', sr,
                      (audio * 32767).astype(np.int16))
        lines.append(f'UTT{i:03d}|{text}|{text}')
    (root / 'metadata.csv').write_text('\n'.join(lines))
    return root


@pytest.fixture(scope='module')
def workdir(tmp_path_factory, corpus):
    """Run the full ETL over the corpus → pattern archive + token dict."""
    from glow_tts_tpu.data.pattern_generator import generate_patterns
    work = tmp_path_factory.mktemp('work')
    overrides = _sound_overrides()
    overrides.update({
        'Token_Path': str(work / 'Token.yaml'),
        'Train': {
            'Train_Pattern': {'Path': str(work / 'Train'),
                              'Mel_Length': {'Min': 10, 'Max': 1000},
                              'Text_Length': {'Min': 5, 'Max': 200}},
            'Eval_Pattern': {'Path': str(work / 'Eval'),
                             'Mel_Length': {'Min': 10, 'Max': 1000},
                             'Text_Length': {'Min': 5, 'Max': 200}},
            'Batch_Size': 2,
            'Learning_Rate': {'Initial': 1.0e-3, 'Base': 100},
            'Checkpoint_Save_Interval': 2,
            'Logging_Interval': 2,
            'Evaluation_Interval': 2,
            'Inference_Interval': 1000,
            'Max_Step': 4,
        },
        'Checkpoint_Path': str(work / 'Checkpoint'),
        'Log_Path': str(work / 'Log'),
        'Inference_Path': str(work / 'Inference'),
        'TPU': {'compute_dtype': 'float32', 'mas_backend': 'scan',
                'token_bucket': 16, 'mel_bucket': 32},
    })
    cfg = tiny_config(**overrides)
    generate_patterns(cfg, {'LJ': str(corpus)}, use_text=True,
                      eval_ratio=0.2, eval_min=1, max_workers=2)
    return work, cfg


def test_etl_outputs(workdir):
    work, cfg = workdir
    meta = pickle.load(open(work / 'Train' / 'METADATA.PICKLE', 'rb'))
    assert meta['File_List'], 'no training patterns generated'
    assert os.path.exists(work / 'Eval' / 'METADATA.PICKLE')
    assert os.path.exists(work / 'Token.yaml')
    # pattern files parse and carry the reference keys
    sample = pickle.load(
        open(work / 'Train' / meta['File_List'][0], 'rb'))
    for key in ('Audio', 'Mel', 'Pitch', 'Speaker_ID', 'Speaker',
                'Dataset', 'Text'):
        assert key in sample
    assert sample['Mel'].shape[1] == cfg.sound.mel_dim
    assert sample['Mel'].shape[0] == sample['Pitch'].shape[0]
    assert meta['Mel_Length_Dict'][meta['File_List'][0]] == \
        sample['Mel'].shape[0]


def test_trainer_end_to_end(workdir):
    work, cfg = workdir
    from glow_tts_tpu.training.trainer import Trainer
    trainer = Trainer(cfg, use_mesh=False, max_mel_length=256)
    trainer.train()
    assert trainer.step == 4
    trainer.checkpoints.wait()
    steps = sorted(int(d) for d in os.listdir(work / 'Checkpoint')
                   if d.isdigit())
    assert 2 in steps and 4 in steps
    # config snapshot written next to checkpoints
    assert os.path.exists(work / 'Checkpoint' / 'Hyper_Parameters.yaml')
    # tensorboard event files exist
    assert any(os.scandir(work / 'Log' / 'Train'))

    # resume from latest
    trainer2 = Trainer(cfg, initial_step=0, use_mesh=False,
                       max_mel_length=256)
    assert trainer2.step == 4
    # resume from exact step
    trainer3 = Trainer(cfg, initial_step=2, use_mesh=False,
                       max_mel_length=256)
    assert trainer3.step == 2


def test_trainer_gr_mode_smoke(workdir):
    """GR-mode trainer end-to-end on the same archive (adversarial
    classifier + pitch conditioning through the full loop)."""
    work, cfg = workdir
    import dataclasses
    from glow_tts_tpu.training.trainer import Trainer
    gr_cfg = dataclasses.replace(
        cfg,
        mode='GR',
        speaker_embedding=dataclasses.replace(
            cfg.speaker_embedding, type='LUT', num_speakers=2,
            embedding_size=16),
        prosody_encoder=cfg.prosody_encoder,
        checkpoint_path=str(work / 'Checkpoint_GR'),
        log_path=str(work / 'Log_GR'),
        train=dataclasses.replace(cfg.train, max_step=2,
                                  evaluation_interval=2,
                                  checkpoint_save_interval=2))
    trainer = Trainer(gr_cfg, use_mesh=False, max_mel_length=128)
    trainer.train()
    assert trainer.step == 2


def test_inferencer_from_checkpoint(workdir, tmp_path):
    work, cfg = workdir
    from glow_tts_tpu.inference import Inferencer
    inferencer = Inferencer(str(work / 'Checkpoint'), config=cfg,
                            batch_size=2, max_mel_length=64)
    out_dir = str(tmp_path / 'artifacts')
    results = inferencer.inference(
        labels=['a', 'b'],
        texts=['HELLO WORLD OF SPEECH.', 'ANOTHER TEST SENTENCE HERE.'],
        length_scales=[1.0, 1.2],
        out_dir=out_dir)
    assert len(results) == 2
    for r in results:
        assert r['mel'].ndim == 2 and r['mel'].shape[1] == cfg.sound.mel_dim
        assert np.isfinite(r['mel']).all()
    assert os.path.exists(os.path.join(out_dir, 'PNG', 'a.png'))
    assert os.path.exists(os.path.join(out_dir, 'NPY', 'Mel', 'b.npy'))
    mel = np.load(os.path.join(out_dir, 'NPY', 'Mel', 'a.npy'))
    assert mel.shape[0] == cfg.sound.mel_dim   # saved transposed [M, T]


def test_resume_reproduces_uninterrupted_run(workdir, tmp_path):
    """Bitwise resume equivalence: train 0→4 straight vs train 0→3,
    checkpoint, resume 3→4 — final parameters identical.  Exercises the
    restored epoch/intra-epoch data-order realignment (the reference
    restores its epoch counter, ``Train.py:535-553``; here the offset
    realigns mid-epoch too) and the order-preserving multi-worker
    loader."""
    import dataclasses
    import jax
    from glow_tts_tpu.training.trainer import Trainer

    work, cfg = workdir

    def with_paths(tag, **train_over):
        return dataclasses.replace(
            cfg,
            checkpoint_path=str(tmp_path / f'Ckpt{tag}'),
            log_path=str(tmp_path / f'Log{tag}'),
            inference_path=str(tmp_path / f'Inf{tag}'),
            train=dataclasses.replace(cfg.train, **train_over))

    # uninterrupted 0→4
    ta = Trainer(with_paths('A', max_step=4), use_mesh=False,
                 max_mel_length=256)
    ta.train()
    params_a = jax.device_get(ta.state.params)

    # interrupted at 3 (mid-epoch: 2 batches/epoch), then resumed 3→4
    cfg_b = with_paths('B', max_step=3, checkpoint_save_interval=3)
    tb = Trainer(cfg_b, use_mesh=False, max_mel_length=256)
    tb.train()
    tb.checkpoints.wait()
    cfg_b4 = dataclasses.replace(
        cfg_b, train=dataclasses.replace(cfg_b.train, max_step=4))
    tb2 = Trainer(cfg_b4, initial_step=0, use_mesh=False,
                  max_mel_length=256)
    assert tb2.step == 3
    tb2.train()
    params_b = jax.device_get(tb2.state.params)

    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params_b))
    for pth, va in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_b[pth]), np.asarray(va),
            err_msg=jax.tree_util.keystr(pth))


def test_inferencer_mesh_matches_single_device(workdir):
    """Serving sharded over the 8-device mesh (Inferencer(use_mesh=True))
    produces the same mels as single-device serving, including a ragged
    tail chunk that pads to the device count."""
    from glow_tts_tpu.inference import Inferencer

    work, cfg = workdir
    texts = ['HELLO WORLD OF SPEECH.', 'ANOTHER TEST SENTENCE HERE.',
             'A THIRD ONE MAKES THE TAIL CHUNK RAGGED.']
    labels = ['a', 'b', 'c']

    single = Inferencer(str(work / 'Checkpoint'), config=cfg,
                        batch_size=3, max_mel_length=64, use_mesh=False)
    meshed = Inferencer(str(work / 'Checkpoint'), config=cfg,
                        batch_size=3, max_mel_length=64, use_mesh=True)
    assert meshed.mesh is not None
    r0 = single.inference(labels=labels, texts=texts)
    r1 = meshed.inference(labels=labels, texts=texts)
    assert len(r0) == len(r1) == 3
    for a, b in zip(r0, r1):
        assert a['mel'].shape == b['mel'].shape
        np.testing.assert_allclose(b['mel'], a['mel'],
                                   rtol=1e-5, atol=1e-5)


def test_trainer_tensor_parallel_end_to_end(workdir, tmp_path):
    """Trainer on a 2×2 (data, model) mesh: state placed tensor-parallel
    (parallel/tp.py), two steps train, checkpoint saves, and the sharded
    run restores; serving from that checkpoint honors model_parallel."""
    import dataclasses
    import jax
    from glow_tts_tpu.inference import Inferencer
    from glow_tts_tpu.training.trainer import Trainer

    work, cfg = workdir
    tp_cfg = dataclasses.replace(
        cfg,
        checkpoint_path=str(tmp_path / 'CkptTP'),
        log_path=str(tmp_path / 'LogTP'),
        inference_path=str(tmp_path / 'InfTP'),
        train=dataclasses.replace(cfg.train, max_step=2),
        tpu=dataclasses.replace(cfg.tpu, data_parallel=2,
                                model_parallel=2))
    trainer = Trainer(tp_cfg, use_mesh=True, max_mel_length=256)
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {'data': 2, 'model': 2}
    v = trainer.state.params['decoder']['flow_0'][
        'coupling']['wavenet']['in_0']['v']
    assert v.addressable_shards[0].data.shape[1] == v.shape[1] // 2, \
        'state was not tensor-parallel placed'
    trainer.train()
    assert trainer.step == 2
    trainer.checkpoints.wait()

    # the sharded state checkpoint restores into a fresh TP trainer
    trainer2 = Trainer(tp_cfg, initial_step=0, use_mesh=True,
                       max_mel_length=256)
    assert trainer2.step == 2
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and serves (Inferencer with model_parallel=2 honored)
    server = Inferencer(str(tmp_path / 'CkptTP'), config=tp_cfg,
                        batch_size=2, max_mel_length=64, use_mesh=True)
    assert dict(server.mesh.shape)['model'] == 2
    results = server.inference(labels=['a', 'b'],
                               texts=['HELLO WORLD OF SPEECH.',
                                      'ANOTHER TEST SENTENCE HERE.'])
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r['mel']).all()


def test_inferencer_picks_small_mel_bucket(workdir):
    """Serving decodes short texts in a small static bucket: the decode
    executable cache holds a bucket below max_mel_length, and disabling
    the ladder reproduces the same mels at noise_scale 0."""
    from glow_tts_tpu.inference import Inferencer

    work, cfg = workdir
    bucketed = Inferencer(str(work / 'Checkpoint'), config=cfg,
                          batch_size=2, max_mel_length=512, use_mesh=False)
    full = Inferencer(str(work / 'Checkpoint'), config=cfg,
                      batch_size=2, max_mel_length=512, use_mesh=False,
                      mel_buckets=())
    assert full.mel_buckets == [512]
    assert bucketed.mel_buckets[0] < 512

    r_b = bucketed.inference(labels=['a', 'b'],
                             texts=['HELLO WORLD.', 'SHORT ONE.'])
    assert bucketed._decode_cache, 'decode cache empty'
    assert min(bucketed._decode_cache) < 512, \
        'short texts did not pick a small bucket'
    r_f = full.inference(labels=['a', 'b'],
                         texts=['HELLO WORLD.', 'SHORT ONE.'])
    assert len(r_b) == len(r_f) == 2
    for a, b in zip(r_b, r_f):
        # same lengths; content differs only in the noise realisation
        assert a['mel'].shape == b['mel'].shape
        assert np.isfinite(a['mel']).all()
