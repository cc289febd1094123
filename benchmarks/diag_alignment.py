"""Alignment-race diagnostic for a saved convergence-run state.

Answers, for a state trained by ``convergence_run.py`` on a given corpus:
given the z the flow CURRENTLY produces, does the likelihood landscape
still reward the TRUE alignment?  Three numbers per batch:

* ``oracle_true``  — total prior log-lik/frame-dim under the TRUE path
  with a per-(token-id, channel) prior fit in closed form from z itself
  (the best any prior could do given correct alignment);
* ``oracle_mas``   — same closed-form fit, but under the CURRENT MAS path
  (the best the degenerate alignment can be scored);
* ``learned_mas``  — the model's actual learned prior under its MAS path.

``oracle_true - oracle_mas`` is the surviving likelihood reward for
correct alignment: if it is ~0 or negative, the flow has already
whitened every token-conditional statistic out of z and NO prior-side
learning could recover the truth — the corpus (at this flow capacity /
step count) cannot lock, and the failure is the task, not the trainer.
If it is solidly positive, the attractor exists and the failure is
learning dynamics (prior lookup too slow vs flow whitening) — the knob
is vocabulary scale / training length, not corpus structure.

Run: python benchmarks/diag_alignment.py --state /tmp/conv_v5.pkl --corpus v5
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_run import CORPORA, MAX_TOK, pad_corpus  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--state', required=True)
    parser.add_argument('--corpus', default='v5')
    parser.add_argument('--batches', type=int, default=4)
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--squeeze', type=int, default=None,
                        help='Decoder.Num_Squeeze of the saved state '
                             '(must match how it was trained)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import create_train_state, make_eval_step

    rng = np.random.default_rng(args.seed)
    corpus = CORPORA[args.corpus](rng)
    on_tpu = jax.devices()[0].platform == 'tpu'
    embedding_tokens = max(
        35, int(max(p['tokens'].max() for p in corpus)) + 1)
    cfg = load_config({
        'Mode': 'Vanilla',
        'Encoder': {'Embedding_Tokens': embedding_tokens},
        'Train': {'Batch_Size': args.batch_size},
        **({'Decoder': {'Num_Squeeze': args.squeeze}}
           if args.squeeze else {}),
        'TPU': {'mas_backend': 'pallas' if on_tpu else 'scan'},
    })
    data, true_durations, frame_token = pad_corpus(
        corpus, cfg.decoder.num_squeeze)

    init_batch = {k: v[:args.batch_size] for k, v in data.items()
                  if k != 'noise_sigma'}
    model, state = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                      init_batch)
    with open(args.state, 'rb') as f:
        saved = pickle.load(f)
    state = jax.tree_util.tree_map(jnp.asarray, saved['state'])
    print(f'# loaded step {saved["step"]} from {args.state}', flush=True)
    eval_step = jax.jit(make_eval_step(cfg, model))

    n_tok = embedding_tokens
    mel_dim = data['mels'].shape[-1]
    # accumulate z sufficient statistics per (token id, channel) per path
    stats = {p: [np.zeros((n_tok, mel_dim)), np.zeros((n_tok, mel_dim)),
                 np.zeros((n_tok,))] for p in ('true', 'mas')}
    zs, paths, valids, learned = [], {'true': [], 'mas': []}, [], []

    for b in range(args.batches):
        idx = np.arange(b * args.batch_size, (b + 1) * args.batch_size)
        batch = {k: v[idx] for k, v in data.items()}
        sig = batch.pop('noise_sigma')
        ev_rng = np.random.default_rng(1234 + b)
        batch['mels'] = np.clip(
            batch['mels'] + sig * ev_rng.standard_normal(
                batch['mels'].shape).astype(np.float32), -4.0, 4.0)
        loss_dict, outputs = eval_step(state, batch)
        z = np.asarray(outputs['z'], np.float32)          # [B, T, C]
        attn = np.asarray(outputs['attentions'], np.float32)
        mas_tok_pos = np.argmax(attn, axis=1)             # [B, T]
        true_tok_pos = np.maximum(frame_token[idx], 0)
        valid = (frame_token[idx] >= 0) & (
            np.arange(z.shape[1])[None, :] < batch['mel_lengths'][:, None])
        tok_ids = batch['tokens']                         # [B, MAX_TOK]
        for name, pos in (('true', true_tok_pos), ('mas', mas_tok_pos)):
            pos_c = np.minimum(pos, MAX_TOK - 1)
            ids = np.take_along_axis(tok_ids, pos_c, axis=1)  # [B, T]
            ids = np.where(valid, ids, 0)
            s0, s1, s2 = stats[name]
            np.add.at(s2, ids[valid], 1.0)
            flat_ids = ids[valid]
            np.add.at(s0, flat_ids, z[valid])
            np.add.at(s1, flat_ids, z[valid] ** 2)
            paths[name].append(ids)
        zs.append(z)
        valids.append(valid)
        mm = np.asarray(outputs['mel_mean'], np.float32)
        ms = np.asarray(outputs['mel_log_std'], np.float32)
        ll = (-0.5 * np.log(2 * np.pi) - ms
              - 0.5 * np.exp(-2 * ms) * (z - mm) ** 2)
        learned.append(float(ll[valid].mean()))

    results = {'learned_mas': round(float(np.mean(learned)), 4)}
    for name in ('true', 'mas'):
        s0, s1, cnt = stats[name]
        cnt = np.maximum(cnt, 1.0)[:, None]
        mu = s0 / cnt
        var = np.maximum(s1 / cnt - mu ** 2, 1e-6)
        total, n_frames = 0.0, 0
        for z, valid, ids in zip(zs, valids, paths[name]):
            m, v = mu[ids], var[ids]                      # [B, T, C]
            ll = (-0.5 * np.log(2 * np.pi * v)
                  - 0.5 * (z - m) ** 2 / v)
            total += float(ll[valid].sum())
            n_frames += int(valid.sum())
        results[f'oracle_{name}'] = round(total / (n_frames * mel_dim), 4)

    results['alignment_reward_nats_per_dim'] = round(
        results['oracle_true'] - results['oracle_mas'], 4)
    import json
    print(json.dumps(results))


if __name__ == '__main__':
    main()
