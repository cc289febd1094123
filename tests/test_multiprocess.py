"""True multi-process training smoke test (VERDICT r3 #7).

The single-process suite validates multi-host logic by monkeypatching
``process_count``; this test spawns TWO real OS processes that
``jax.distributed.initialize`` against a localhost coordinator (CPU
backend, 2 virtual devices each → a 4-device global mesh) and run the
real ``Trainer`` end-to-end: per-process data loading,
``shard_host_local_batch`` global-array assembly, collective orbax
checkpoint save, resume, and a sharded eval epoch
(``tests/multiprocess_worker.py``).

Reference surface being proven: the trainer loop of ``Train.py:240-265``
under the SPMD data parallelism the reference never had (SURVEY.md §5).
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers import tiny_config

TEXTS = [
    'THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG.',
    'PACK MY BOX WITH FIVE DOZEN LIQUOR JUGS, PLEASE!',
    'HOW VEXINGLY QUICK DAFT ZEBRAS JUMP TODAY?',
    "SPHINX OF BLACK QUARTZ, JUDGE MY VOW AND SMILE.",
    'A SHINING CRESCENT FAR BENEATH THE FLYING VESSEL.',
    'BRIGHT VIXENS JUMP WHILE DOZY FOWL QUACK LOUDLY.',
    'JINXED WIZARDS PLUCK IVY FROM THE BIG QUILT NOW.',
    'FIVE QUACKING ZEPHYRS JOLT MY WAX BED TONIGHT.',
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.fixture(scope='module')
def mp_workdir(tmp_path_factory):
    """Synthetic LJ corpus → ETL → config pickle for the workers."""
    from scipy.io import wavfile
    from glow_tts_tpu.data.pattern_generator import generate_patterns

    corpus = tmp_path_factory.mktemp('mp_corpus')
    wav_dir = corpus / 'wavs'
    wav_dir.mkdir()
    sr = 1600
    rng = np.random.default_rng(7)
    lines = []
    for i, text in enumerate(TEXTS):
        dur = 1.0 + 0.2 * i
        t = np.arange(int(sr * dur)) / sr
        audio = (0.5 * np.sin(2 * np.pi * (140 + 25 * i) * t)
                 + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
        wavfile.write(wav_dir / f'UTT{i:03d}.wav', sr,
                      (audio * 32767).astype(np.int16))
        lines.append(f'UTT{i:03d}|{text}|{text}')
    (corpus / 'metadata.csv').write_text('\n'.join(lines))

    work = tmp_path_factory.mktemp('mp_work')
    cfg = tiny_config(**{
        'Sound': {
            'Mel_Dim': 8, 'Spectrogram_Dim': 65, 'Frame_Length': 64,
            'Frame_Shift': 16, 'Sample_Rate': 1600, 'Mel_F_Min': 50,
            'Mel_F_Max': 600, 'Max_Abs_Mel': 4,
            'Confidence_Threshold': 0.6, 'Gaussian_Smoothing_Sigma': 0.0,
            'Pitch_Min': 100.0, 'Pitch_Max': 400.0},
        'Token_Path': str(work / 'Token.yaml'),
        'Train': {
            'Train_Pattern': {'Path': str(work / 'Train'),
                              'Mel_Length': {'Min': 10, 'Max': 1000},
                              'Text_Length': {'Min': 5, 'Max': 200}},
            'Eval_Pattern': {'Path': str(work / 'Eval'),
                             'Mel_Length': {'Min': 10, 'Max': 1000},
                             'Text_Length': {'Min': 5, 'Max': 200}},
            'Batch_Size': 4,            # 2 per process × 2 processes
            'Learning_Rate': {'Initial': 1.0e-3, 'Base': 100},
            'Checkpoint_Save_Interval': 2,
            'Logging_Interval': 2,
            'Evaluation_Interval': 1000,
            'Inference_Interval': 1000,
            'Max_Step': 4,
        },
        'Checkpoint_Path': str(work / 'Checkpoint'),
        'Log_Path': str(work / 'Log'),
        'Inference_Path': str(work / 'Inference'),
        'TPU': {'compute_dtype': 'float32', 'mas_backend': 'scan',
                'token_bucket': 16, 'mel_bucket': 32},
    })
    generate_patterns(cfg, {'LJ': str(corpus)}, use_text=True,
                      eval_ratio=0.25, eval_min=2, max_workers=2)
    with open(work / 'mp_cfg.pkl', 'wb') as f:
        pickle.dump(cfg, f)
    return work


def test_two_process_train_checkpoint_resume(mp_workdir):
    nprocs = 2
    coordinator = f'localhost:{_free_port()}'
    worker = os.path.join(os.path.dirname(__file__),
                          'multiprocess_worker.py')
    env = dict(os.environ)
    env.update({
        'JAX_PLATFORMS': 'cpu',
        'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
        # the workers build their own distributed runtime — drop any
        # inherited compilation-cache contention risk with the parent
        'JAX_COMPILATION_CACHE_DIR':
            os.path.join(str(mp_workdir), '.jax_cache'),
    })
    env.pop('GLOWTTS_MULTIHOST', None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid), str(nprocs),
             str(mp_workdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in range(nprocs)
    ]
    outs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outs.append(out)
    for pid, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, (
            f'worker {pid} failed (rc={proc.returncode}):\n{out[-4000:]}')
    mpok = [line for out in outs for line in out.splitlines()
            if line.startswith('MPOK ')]
    assert len(mpok) == nprocs, f'expected {nprocs} MPOK lines:\n{outs}'
    # both processes trained to the same step, saved the same checkpoints,
    # and restored bit-identical replicated parameters
    assert mpok[0] == mpok[1], mpok
    assert 'step=4' in mpok[0], mpok[0]
    assert 'ckpts=[2, 4]' in mpok[0], mpok[0]
