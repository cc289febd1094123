"""Trainer metric helpers."""

import numpy as np

from glow_tts_tpu.training.trainer import attention_diagonality
from glow_tts_tpu.utils.logging import StepTimer


def test_diagonality_perfect_alignment():
    tx, ty = 10, 40
    attn = np.zeros((1, 16, 64), np.float32)
    for j in range(ty):
        attn[0, int(round(j * (tx - 1) / (ty - 1))), j] = 1.0
    score = attention_diagonality(attn, np.array([tx]), np.array([ty]))
    assert score > 0.95


def test_diagonality_degenerate_alignment():
    tx, ty = 10, 40
    attn = np.zeros((1, 16, 64), np.float32)
    attn[0, 0, :ty] = 1.0           # everything collapsed on token 0
    score = attention_diagonality(attn, np.array([tx]), np.array([ty]))
    assert score < 0.8


def test_step_timer_accumulates_frames():
    import time
    timer = StepTimer()
    timer.tick(1)                    # arm
    timer.add_frames(100)
    timer.add_frames(100)
    time.sleep(0.05)
    metrics = timer.tick(2)
    assert 0.01 < metrics['step_time_sec'] < 1.0
    assert metrics['mel_frames_per_sec'] > 0
    # frames reset after a tick
    time.sleep(0.01)
    assert 'mel_frames_per_sec' not in timer.tick(1)
