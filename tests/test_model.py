"""End-to-end model tests: init (with ActNorm data init inside), training
forward, loss computation, a few optimizer steps, and static-shape
inference — across all four conditioning modes (SURVEY.md §0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glow_tts_tpu.training.step import (
    create_train_state, make_eval_step, make_inference_step,
    make_train_step)
from tests.helpers import synthetic_batch, tiny_config

MODES = ['Vanilla', 'SE', 'PE', 'GR']


def _setup(mode, se_type='LUT'):
    cfg = tiny_config(mode=mode)
    if se_type != 'LUT':
        cfg = tiny_config(mode=mode, **{
            'Speaker_Embedding': {
                'Type': se_type, 'Num_Speakers': 4, 'Embedding_Size': 16,
                'GE2E': {'LSTM': {'Sizes': 16, 'Stacks': 2},
                         'Inference': {'Samples': 2, 'Slice_Length': 12,
                                       'Overlap_Length': 4}}}})
    batch = synthetic_batch(cfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    return cfg, batch, model, state


@pytest.mark.parametrize('mode', MODES)
def test_train_step_runs_and_loss_finite(mode):
    cfg, batch, model, state = _setup(mode)
    train_step = jax.jit(make_train_step(cfg, model))
    state, metrics = train_step(state, batch)
    for name, value in metrics.items():
        assert np.isfinite(np.asarray(value)), f'{name} not finite'
    assert int(state.step) == 1
    if mode == 'GR':
        assert 'speaker' in metrics


def test_loss_decreases_over_steps():
    cfg, batch, model, state = _setup('Vanilla')
    train_step = jax.jit(make_train_step(cfg, model))
    eval_step = jax.jit(make_eval_step(cfg, model))
    before = float(eval_step(state, batch)[0]['total'])
    for _ in range(25):
        state, _ = train_step(state, batch)
    after = float(eval_step(state, batch)[0]['total'])
    assert after < before


@pytest.mark.parametrize('mode', ['Vanilla', 'SE'])
def test_inference_shapes_and_padding(mode):
    cfg, batch, model, state = _setup(mode)
    max_mel = 64
    infer = jax.jit(make_inference_step(cfg, model, max_mel_length=max_mel))
    out = infer(state, batch, jax.random.PRNGKey(7))
    mels = np.asarray(out['mels'])
    lengths = np.asarray(out['mel_lengths'])
    assert mels.shape == (batch['tokens'].shape[0], max_mel,
                          cfg.sound.mel_dim)
    assert np.all(lengths >= cfg.decoder.num_squeeze)
    assert np.all(lengths <= max_mel)
    # padding filled with -max_abs_mel
    for i, length in enumerate(lengths):
        assert np.allclose(mels[i, length:], -cfg.sound.max_abs_mel)
    # attentions are a valid monotonic hard path within lengths
    attn = np.asarray(out['attentions'])
    for i, length in enumerate(lengths):
        assert np.all(attn[i, :, :length].sum(axis=0) == 1)


def test_ge2e_mode_forward():
    cfg, batch, model, state = _setup('SE', se_type='GE2E')
    train_step = jax.jit(make_train_step(cfg, model))
    state, metrics = train_step(state, batch)
    assert np.isfinite(np.asarray(metrics['total']))
    # frozen GE2E: parameters must not change after a step
    lstm_before = jax.tree_util.tree_leaves(
        state.params['ge2e'])
    state2, _ = train_step(state, batch)
    lstm_after = jax.tree_util.tree_leaves(state2.params['ge2e'])
    for a, b in zip(lstm_before, lstm_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_teacher_forced_attention_matches_mas_properties():
    cfg, batch, model, state = _setup('Vanilla')
    eval_step = jax.jit(make_eval_step(cfg, model))
    loss_dict, outputs = eval_step(state, batch)
    attn = np.asarray(outputs['attentions'])
    for i in range(attn.shape[0]):
        ty = int(batch['mel_lengths'][i])
        tx = int(batch['token_lengths'][i])
        assert np.all(attn[i, :, :ty].sum(axis=0) == 1)
        assert attn[i, :tx, :ty].sum() == ty
    # duration targets: log(sum of attention row + eps)
    dur = np.asarray(outputs['log_duration_targets'])
    assert dur.shape == (attn.shape[0], attn.shape[1], 1)


def test_inference_batch_one_and_minimal_tokens():
    cfg, batch, model, state = _setup('Vanilla')
    infer = jax.jit(make_inference_step(cfg, model, max_mel_length=32))
    tiny = {
        'tokens': batch['tokens'][:1, :4],
        'token_lengths': np.array([2], np.int32),   # <S> <E> only
    }
    out = infer(state, tiny, jax.random.PRNGKey(0))
    mels = np.asarray(out['mels'])
    assert mels.shape == (1, 32, cfg.sound.mel_dim)
    assert np.isfinite(mels).all()
    assert int(out['mel_lengths'][0]) >= cfg.decoder.num_squeeze


def test_linear_alignment_path_properties():
    """The warmup path is a valid hard monotonic alignment: every valid
    frame owned by exactly one valid token, tokens in order, durations as
    uniform as integer rounding allows."""
    from glow_tts_tpu.models.glow_tts import linear_alignment_path

    token_lengths = jnp.asarray([5, 1, 7], jnp.int32)
    mel_lengths = jnp.asarray([16, 10, 7], jnp.int32)
    t_tok, t_mel = 8, 20
    tok_mask = (np.arange(t_tok)[None, :]
                < np.asarray(token_lengths)[:, None]).astype(np.float32)
    mel_mask = (np.arange(t_mel)[None, :]
                < np.asarray(mel_lengths)[:, None]).astype(np.float32)
    attn_mask = tok_mask[:, :, None] * mel_mask[:, None, :]
    path = np.asarray(linear_alignment_path(
        token_lengths, mel_lengths, jnp.asarray(attn_mask)))
    for i, (tl, ml) in enumerate(zip([5, 1, 7], [16, 10, 7])):
        assert np.all(path[i, :, :ml].sum(axis=0) == 1)     # frame coverage
        assert path[i].sum() == ml                           # nothing extra
        owners = path[i, :, :ml].argmax(axis=0)
        assert np.all(np.diff(owners) >= 0)                  # monotonic
        durations = path[i].sum(axis=1)
        assert np.all(durations[:tl] >= ml // tl)            # near-uniform
        assert np.all(durations[tl:] == 0)


def test_alignment_warmup_train_step():
    """linear_alignment=True trains against the uniform path: the returned
    attentions equal linear_alignment_path and the loss is finite."""
    from glow_tts_tpu.models.glow_tts import linear_alignment_path

    cfg, batch, model, state = _setup('Vanilla')
    warm_step = jax.jit(make_train_step(cfg, model, linear_alignment=True))
    state, metrics = warm_step(state, batch)
    assert np.isfinite(np.asarray(metrics['total']))

    eval_out = model.apply(
        {'params': state.params}, tokens=batch['tokens'],
        token_lengths=batch['token_lengths'], mels=batch['mels'],
        mel_lengths=batch['mel_lengths'], deterministic=True,
        linear_alignment=True)
    tok_mask = (np.arange(batch['tokens'].shape[1])[None, :]
                < np.asarray(batch['token_lengths'])[:, None])
    mel_mask = (np.arange(batch['mels'].shape[1])[None, :]
                < np.asarray(batch['mel_lengths'])[:, None])
    attn_mask = (tok_mask[:, :, None] * mel_mask[:, None, :]).astype(
        np.float32)
    expected = np.asarray(linear_alignment_path(
        jnp.asarray(batch['token_lengths']),
        jnp.asarray(batch['mel_lengths']), jnp.asarray(attn_mask)))
    np.testing.assert_array_equal(
        np.asarray(eval_out['attentions'], np.float32), expected)


def test_anchored_alignment_path_pins_silences():
    """The 'anchored' warmup path (train.alignment_warmup_mode) is a valid
    monotonic complete path that assigns pause tokens to the silent-frame
    runs and splits the loud spans near-uniformly between them."""
    from glow_tts_tpu.models.glow_tts import anchored_alignment_path

    PAUSE = 9
    # utterance: 3 loud tokens (12 frames), pause (6 silent), 2 loud (10)
    tokens = np.full((1, 8), 1, np.int32)
    tokens[0, :6] = [3, 4, 5, PAUSE, 6, 7]
    token_lengths = np.array([6], np.int32)
    mel = np.full((1, 32, 8), -1.0, np.float32)     # loud floor
    mel[0, 12:18] = -4.0                            # the silence run
    mel_lengths = np.array([28], np.int32)
    tok_mask = (np.arange(8)[None, :] < token_lengths[:, None])
    mel_mask = (np.arange(32)[None, :] < mel_lengths[:, None])
    attn_mask = (tok_mask[:, :, None] * mel_mask[:, None, :]).astype(
        np.float32)

    path = np.asarray(anchored_alignment_path(
        jnp.asarray(tokens), jnp.asarray(token_lengths), jnp.asarray(mel),
        jnp.asarray(mel_lengths), jnp.asarray(attn_mask),
        (PAUSE,), -3.5, 'scan'))

    assert np.all(path[0, :, :28].sum(axis=0) == 1)       # complete
    assert path[0].sum() == 28
    owners = path[0, :, :28].argmax(axis=0)
    assert np.all(np.diff(owners) >= 0)                   # monotonic
    # the pause token (index 3) owns exactly the silent run
    assert set(np.where(owners == 3)[0]) == set(range(12, 18))
    # loud spans split among the loud tokens only
    assert set(owners[:12]) == {0, 1, 2}
    assert set(owners[18:]) == {4, 5}


def test_anchored_alignment_train_step():
    """anchored_alignment=True trains against the surrogate-MAS path: the
    returned attentions equal anchored_alignment_path and the loss is
    finite (the config carries the pause ids / silence level)."""
    from glow_tts_tpu.models.glow_tts import anchored_alignment_path

    cfg = tiny_config(mode='Vanilla', **{
        'Train': {'Alignment_Warmup_Mode': 'anchored',
                  'Anchor_Pause_Tokens': [2],
                  'Anchor_Silence_Level': -3.5}})
    batch = synthetic_batch(cfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    warm_step = jax.jit(make_train_step(cfg, model,
                                        anchored_alignment=True))
    state, metrics = warm_step(state, batch)
    assert np.isfinite(np.asarray(metrics['total']))

    eval_out = model.apply(
        {'params': state.params}, tokens=batch['tokens'],
        token_lengths=batch['token_lengths'], mels=batch['mels'],
        mel_lengths=batch['mel_lengths'], deterministic=True,
        anchored_alignment=True)
    tok_mask = (np.arange(batch['tokens'].shape[1])[None, :]
                < np.asarray(batch['token_lengths'])[:, None])
    mel_mask = (np.arange(batch['mels'].shape[1])[None, :]
                < np.asarray(batch['mel_lengths'])[:, None])
    attn_mask = (tok_mask[:, :, None] * mel_mask[:, None, :]).astype(
        np.float32)
    expected = np.asarray(anchored_alignment_path(
        jnp.asarray(batch['tokens']),
        jnp.asarray(batch['token_lengths']), jnp.asarray(batch['mels']),
        jnp.asarray(batch['mel_lengths']), jnp.asarray(attn_mask),
        cfg.train.anchor_pause_tokens, cfg.train.anchor_silence_level,
        'scan'))
    np.testing.assert_array_equal(
        np.asarray(eval_out['attentions'], np.float32), expected)


def test_em_table_recovers_true_path():
    """The closed-form EM core (train.alignment_warmup_mode: 'em'): when z
    is drawn from well-separated per-token-ID Gaussians, fitting the table
    from the TRUE path and running MAS on the table score must recover the
    true path exactly — the mechanism behind the measured 0.9984 lock
    (benchmarks/diag_em_on_z.py)."""
    from glow_tts_tpu.models.glow_tts import (
        fit_token_table, table_prior_log_likelihood)
    from glow_tts_tpu.ops import mas as mas_ops

    rng = np.random.default_rng(0)
    B, T_tok, T_mel, C, V = 2, 6, 24, 4, 12
    # without replacement: a repeated ID inside one utterance makes the
    # boundary between its two spans likelihood-tied (any split scores
    # identically), so exact recovery is only defined for distinct IDs
    tokens = np.stack([rng.permutation(np.arange(1, V))[:T_tok]
                       for _ in range(B)]).astype(np.int32)
    token_lengths = np.array([6, 5], np.int32)
    mel_lengths = np.array([24, 20], np.int32)
    means = rng.normal(scale=4.0, size=(V, C)).astype(np.float32)
    # ground-truth monotonic path: near-uniform split of frames per token
    path = np.zeros((B, T_tok, T_mel), np.float32)
    z = np.zeros((B, T_mel, C), np.float32)
    for b in range(B):
        bounds = np.linspace(0, mel_lengths[b], token_lengths[b] + 1)
        bounds = bounds.astype(int)
        for i in range(token_lengths[b]):
            path[b, i, bounds[i]:bounds[i + 1]] = 1.0
            z[b, bounds[i]:bounds[i + 1]] = (
                means[tokens[b, i]]
                + 0.05 * rng.normal(size=(bounds[i + 1] - bounds[i], C)))
    tok_mask = (np.arange(T_tok)[None] < token_lengths[:, None])
    mel_mask = (np.arange(T_mel)[None] < mel_lengths[:, None])
    attn_mask = (tok_mask[:, :, None] * mel_mask[:, None, :]).astype(
        np.float32)

    stats = fit_token_table(
        jnp.asarray(tokens), jnp.asarray(path), jnp.asarray(z),
        jnp.asarray(mel_mask[..., None].astype(np.float32)), V)
    log_p, m_tok, log_std_tok = table_prior_log_likelihood(
        jnp.asarray(tokens), jnp.asarray(z), stats, jnp.asarray(attn_mask))
    recovered = np.asarray(mas_ops.maximum_path(
        log_p, jnp.asarray(token_lengths), jnp.asarray(mel_lengths),
        backend='scan'))
    np.testing.assert_array_equal(recovered, path)
    # distillation targets gather the table at the batch tokens
    cnt, s0, _ = jax.tree_util.tree_map(np.asarray, stats)
    table_mean = s0 / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(
        np.asarray(m_tok), table_mean[tokens], rtol=1e-6)
    assert np.isfinite(np.asarray(log_std_tok)).all()


def test_em_alignment_train_step():
    """em_alignment=True: the step runs, carries the EMA statistics in
    state.em_stats, emits a finite distillation loss, and the returned
    attentions are a complete monotonic path."""
    cfg = tiny_config(mode='Vanilla', **{
        'Train': {'Alignment_Warmup_Mode': 'em',
                  'Alignment_Warmup_Steps': 10,
                  'Anchor_Pause_Tokens': [2],
                  'Anchor_Silence_Level': -3.5}})
    batch = synthetic_batch(cfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    assert state.em_stats is not None
    assert state.em_stats[0].shape == (cfg.encoder.embedding_tokens,)
    assert float(state.em_stats[0].sum()) == 0.0

    em_step = jax.jit(make_train_step(cfg, model, em_alignment=True))
    for _ in range(2):
        state, metrics = em_step(state, batch)
    assert np.isfinite(np.asarray(metrics['total']))
    assert np.isfinite(np.asarray(metrics['distill']))
    # the EMA pooled ~masked-frame-count worth of ownership per E/M pass
    assert float(state.em_stats[0].sum()) > 0.0

    # the post-warmup step (no em flag) must still run on the same state
    plain_step = jax.jit(make_train_step(cfg, model))
    state, metrics = plain_step(state, batch)
    assert np.isfinite(np.asarray(metrics['total']))

    out = model.apply(
        {'params': state.params}, tokens=batch['tokens'],
        token_lengths=batch['token_lengths'], mels=batch['mels'],
        mel_lengths=batch['mel_lengths'], deterministic=True,
        em_alignment=True,
        em_stats=jax.tree_util.tree_map(jnp.asarray, state.em_stats))
    path = np.asarray(out['attentions'], np.float32)
    for b in range(path.shape[0]):
        tl = int(batch['token_lengths'][b])
        ml = int(batch['mel_lengths'][b])
        assert path[b, :, :ml].sum() == ml                 # complete
        owners = path[b, :, :ml].argmax(axis=0)
        assert np.all(np.diff(owners) >= 0)                # monotonic
        assert owners.max() < tl


def test_decoder_freeze_step():
    """freeze_decoder=True (train.decoder_freeze_steps) must leave every
    flow-decoder parameter bit-unchanged while the encoder still trains —
    the alignment-curriculum phase that turns prior↔MAS into pure EM
    (docs/CONVERGENCE.md)."""
    cfg, batch, model, state = _setup('Vanilla')
    frozen_step = jax.jit(make_train_step(cfg, model, linear_alignment=True,
                                          freeze_decoder=True))
    dec_before = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params['decoder']))
    enc_before = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params['encoder']))
    for _ in range(2):
        state, metrics = frozen_step(state, batch)
    assert np.isfinite(np.asarray(metrics['total']))
    dec_after = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params['decoder']))
    enc_after = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params['encoder']))
    for a, b in zip(dec_before, dec_after):
        np.testing.assert_array_equal(a, b)
    assert any(not np.array_equal(a, b)
               for a, b in zip(enc_before, enc_after))


@pytest.mark.parametrize('mode', ['Vanilla', 'GR'])
def test_weight_norm_fold_parity(mode):
    """Serving folds weight norm at load (v ← g·v/‖v‖, round-2 weak #7):
    the folded model on the folded tree must be BIT-identical to the
    unfolded model — same fp32 expression, evaluated once instead of per
    dispatch."""
    import dataclasses

    from glow_tts_tpu.models.layers import fold_weight_norm_params
    from glow_tts_tpu.training.step import build_model

    cfg, batch, model, state = _setup(mode)
    # a couple of real optimizer steps so g drifts away from ‖v‖
    train_step = jax.jit(make_train_step(cfg, model))
    for _ in range(3):
        state, _ = train_step(state, batch)
    if mode == 'GR':        # inference path needs prosody/pitch references
        batch = dict(batch)
        batch['mels_for_prosody'] = batch['mels']
        batch['mel_lengths_for_prosody'] = batch['mel_lengths']
        batch['pitch_lengths'] = batch['mel_lengths']

    fold_cfg = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, fold_weight_norm=True))
    folded_state = state.replace(
        params=fold_weight_norm_params(state.params))

    # no 'g' left anywhere in the folded tree
    flat = jax.tree_util.tree_flatten_with_path(folded_state.params)[0]
    assert not any(path[-1].key == 'g' for path, _ in flat
                   if hasattr(path[-1], 'key'))

    rng = jax.random.PRNGKey(11)
    base = jax.jit(make_inference_step(cfg, model, max_mel_length=48))(
        state, batch, rng)
    folded = jax.jit(make_inference_step(
        fold_cfg, build_model(fold_cfg), max_mel_length=48))(
        folded_state, batch, rng)
    np.testing.assert_array_equal(np.asarray(base['mels']),
                                  np.asarray(folded['mels']))
    np.testing.assert_array_equal(np.asarray(base['mel_lengths']),
                                  np.asarray(folded['mel_lengths']))


def _em_lock_corpus(rng, batch=8, n_words=4):
    """Tiny EM-lockable corpus on the tiny config's 8-dim mels: words of
    two 4-frame content tokens followed by a 4-frame silence pause, with
    strong per-token-ID mean signatures — the v9 geometry in miniature
    (benchmarks/convergence_run.py make_corpus_v6)."""
    pause, vocab_lo, vocab_hi, dur = 2, 3, 11, 4
    signatures = rng.normal(0.0, 2.0, (vocab_hi, 8)).astype(np.float32)
    t_tok = 3 * n_words
    t_mel = t_tok * dur
    tokens = np.zeros((batch, t_tok), np.int32)
    mels = np.zeros((batch, t_mel, 8), np.float32)
    owners = np.repeat(np.arange(t_tok), dur)
    for b in range(batch):
        seq = []
        for _ in range(n_words):
            seq.extend(rng.integers(vocab_lo, vocab_hi, 2).tolist())
            seq.append(pause)
        tokens[b] = seq
        mel = np.where((tokens[b] == pause)[owners][:, None],
                       -4.0, signatures[tokens[b]][owners])
        mels[b] = np.clip(
            mel + rng.normal(0.0, 0.1, mel.shape), -4.0, 4.0)
    return {'tokens': tokens,
            'token_lengths': np.full((batch,), t_tok, np.int32),
            'mels': mels,
            'mel_lengths': np.full((batch,), t_mel, np.int32)}, owners


def _learned_prior_accuracy(model, state, batch, owners):
    """Fraction of frames the LEARNED-prior MAS assigns to the true token
    — the metric the convergence gate asserts (plain forward, no warmup
    flags: the post-release configuration)."""
    out = model.apply(
        {'params': state.params}, tokens=batch['tokens'],
        token_lengths=batch['token_lengths'], mels=batch['mels'],
        mel_lengths=batch['mel_lengths'], deterministic=True)
    attn = np.asarray(out['attentions'], np.float32)
    return float((attn.argmax(axis=1) == owners[None, :]).mean())


def test_em_release_transition_keeps_lock():
    """The gate run's highest-risk moment (VERDICT r4 #6): the em→learned
    prior release.  The distillation (training/losses.py:
    prior_distill_loss) must have transferred the table lock into the
    network prior so learned-prior MAS holds the alignment through and
    after the switch, instead of collapsing back toward the cold-start
    path."""
    cfg = tiny_config(**{
        'Train': {'Batch_Size': 8,
                  'Learning_Rate': {'Initial': 3.0e-3, 'Base': 4000},
                  'ADAM': {'Beta1': 0.9, 'Beta2': 0.999,
                           'Epsilon': 1.0e-6},
                  'Weight_Decay': 1.0e-6, 'Gradient_Norm': 5.0,
                  'Alignment_Warmup_Mode': 'em',
                  'Alignment_Warmup_Steps': 150,
                  'Anchor_Pause_Tokens': [2],
                  'Anchor_Silence_Level': -3.5}})
    rng = np.random.default_rng(7)
    batch, owners = _em_lock_corpus(rng)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    em_step = jax.jit(make_train_step(cfg, model, em_alignment=True,
                                      freeze_decoder=True))
    for _ in range(150):
        state, metrics = em_step(state, batch)
    acc_warm = _learned_prior_accuracy(model, state, batch, owners)
    # the distillation transferred the table lock into the network prior
    assert acc_warm > 0.85, acc_warm

    plain_step = jax.jit(make_train_step(cfg, model))
    for _ in range(30):
        state, metrics = plain_step(state, batch)
        assert np.isfinite(np.asarray(metrics['total']))
    acc_released = _learned_prior_accuracy(model, state, batch, owners)
    assert acc_released > acc_warm - 0.05, (acc_warm, acc_released)


def test_em_stats_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of TrainState.em_stats mid-warmup (VERDICT r4
    #6), plus both structure-mismatch fallbacks (ADVICE r4): resuming a
    pre-em checkpoint under an 'em' config, and resuming an em
    checkpoint under a config without the warmup."""
    from glow_tts_tpu.training.checkpoint import CheckpointManager

    em_overrides = {
        'Train': {'Batch_Size': 4,
                  'Learning_Rate': {'Initial': 1.0e-3, 'Base': 100},
                  'ADAM': {'Beta1': 0.9, 'Beta2': 0.999,
                           'Epsilon': 1.0e-6},
                  'Weight_Decay': 1.0e-6, 'Gradient_Norm': 5.0,
                  'Alignment_Warmup_Mode': 'em',
                  'Alignment_Warmup_Steps': 10,
                  'Anchor_Pause_Tokens': [2],
                  'Anchor_Silence_Level': -3.5}}
    cfg = tiny_config(**em_overrides)
    batch = synthetic_batch(cfg)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    em_step = jax.jit(make_train_step(cfg, model, em_alignment=True))
    for _ in range(2):
        state, _ = em_step(state, batch)
    assert float(state.em_stats[0].sum()) > 0.0

    mgr = CheckpointManager(str(tmp_path / 'ckpt_em'), config=cfg)
    mgr.save(2, state, wait=True)

    # exact round-trip against a fresh mid-warmup template
    _, template = create_train_state(cfg, jax.random.PRNGKey(1), batch)
    restored, step = mgr.restore(template)
    assert step == 2
    for got, want in zip(jax.tree_util.tree_leaves(restored.em_stats),
                         jax.tree_util.tree_leaves(state.em_stats)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # ...and the warmup continues from the restored statistics
    resumed, _ = em_step(restored, batch)
    assert np.isfinite(float(resumed.em_stats[0].sum()))

    # mismatch 1: em checkpoint, config WITHOUT the warmup → stats dropped
    plain_cfg = tiny_config()
    _, plain_template = create_train_state(
        plain_cfg, jax.random.PRNGKey(1), batch)
    assert plain_template.em_stats is None
    mgr_plain = CheckpointManager(str(tmp_path / 'ckpt_em'),
                                  config=plain_cfg)
    with pytest.warns(UserWarning, match='dropping'):
        restored_plain, _ = mgr_plain.restore(plain_template)
    assert restored_plain.em_stats is None
    np.testing.assert_array_equal(
        np.asarray(restored_plain.step), np.asarray(state.step))

    # mismatch 2: pre-em checkpoint, 'em' config → fresh zero statistics
    mgr2 = CheckpointManager(str(tmp_path / 'ckpt_plain'), config=plain_cfg)
    mgr2.save(1, restored_plain, wait=True)
    mgr2_em = CheckpointManager(str(tmp_path / 'ckpt_plain'), config=cfg)
    with pytest.warns(UserWarning, match='freshly-initialised'):
        restored_em, _ = mgr2_em.restore(template)
    assert restored_em.em_stats is not None
    assert float(restored_em.em_stats[0].sum()) == 0.0
