"""Fixed-seed end-to-end regression pins (SURVEY §4c).

Golden values recorded on the 8-device virtual-CPU test platform at round 1;
they guard against silent semantic drift in the model/loss/optimizer stack.
A legitimate change to initialisation or math should update them knowingly.
Tolerances are loose enough to absorb compiler/codegen LSB differences.
"""

import jax
import numpy as np
import pytest

from glow_tts_tpu.training.step import (create_train_state, make_eval_step,
                                        make_train_step)
from tests.helpers import synthetic_batch, tiny_config

# The deterministic eval pin survives any dropout-stream change; it has
# matched since round 1.
GOLDEN_EVAL0 = {'duration': 0.569171, 'mle': 2.680661, 'total': 3.249831}
# Train-step pins re-recorded whenever the dropout bit stream legitimately
# changes — round 3: threefry → hardware RNG (layers.FastDropout);
# round 5: 32-bit → 16-bit mask words, then time-major mask generation at
# the hot sites (layers.FastDropout.time_major_bits — kills 119 in-fusion
# mask relayout copies, train step 22.2 → 20.7 ms/step on v5e).  Identical
# functional semantics, different random bits, so the exact loss trajectory
# moves (eval0 above did NOT, proving the deterministic path is untouched).
GOLDEN_STEPS = [
    {'duration': 0.878132, 'mle': 2.465242, 'total': 3.343374,
     'grad_norm': 10.62335},
    {'duration': 0.509285, 'mle': 2.614827, 'total': 3.124112,
     'grad_norm': 9.318247},
    {'duration': 0.693431, 'mle': 2.364841, 'total': 3.058272,
     'grad_norm': 8.779524},
]


def test_fixed_seed_training_regression():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, rng=np.random.default_rng(1234))
    model, state = create_train_state(cfg, jax.random.PRNGKey(42), batch)
    train = jax.jit(make_train_step(cfg, model))
    evalf = jax.jit(make_eval_step(cfg, model))

    eval0 = {k: float(np.asarray(v))
             for k, v in evalf(state, batch)[0].items()}
    for key, expected in GOLDEN_EVAL0.items():
        assert eval0[key] == pytest.approx(expected, rel=2e-3), \
            f'eval {key}: {eval0[key]} vs golden {expected}'

    for golden in GOLDEN_STEPS:
        state, metrics = train(state, batch)
        got = {k: float(np.asarray(v)) for k, v in metrics.items()}
        for key, expected in golden.items():
            assert got[key] == pytest.approx(expected, rel=5e-3), \
                f'step {key}: {got[key]} vs golden {expected}'
