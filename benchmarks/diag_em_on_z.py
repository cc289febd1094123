"""EM-on-z diagnostic: closed-form per-token-ID Gaussian fit on the
FROZEN flow's featurisation z from a saved convergence state, iterated
with MAS (classic EM), from several initialisations.

This is the experiment that localised the round-4 convergence blocker
(docs/CONVERGENCE.md): on the v9 corpus at step 5000 of the anchored
curriculum the *network* prior's MAS accuracy is stuck at 0.5336, while
this probe's closed-form table prior on the SAME z reaches **0.9984 in
one EM iteration** from both the true path and the 0.8867-accurate
anchored init.  The featurisation keeps the corpus perfectly separable;
the blocker is SGD prior underfit — which the ``em`` alignment-warmup
mode (models/glow_tts.py:em_alignment_path) fixes by running exactly
this closed-form E/M pair inside the train step and distilling the
table into the network prior.

Measured (TPU v5e, 2026-08-19, state = v9 anchored run @5000):

    learned-prior MAS acc: 0.5336
    from-true     EM iter 1: acc 0.9984   (oracle ceiling on z)
    from-anchored init acc: 0.8867
    from-anchored EM iter 1: acc 0.9984   (stable through iter 6)

``--stats-batch N`` fits the table on independent N-sample slices
instead of the pooled eval set — the feasibility check for running EM
per train batch (batch 32) rather than corpus-wide.

The reference has no analogue: its MAS always scores the learned prior
(/root/reference/Modules.py:107-116).  This probe is pure diagnosis of
the optimisation landscape, usable for any saved convergence state.
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--state', required=True, help='convergence state .pkl')
    p.add_argument('--corpus', default='v9')
    p.add_argument('--n', type=int, default=256, help='eval samples')
    p.add_argument('--stats-batch', type=int, default=None,
                   help='fit table stats on independent slices of this '
                        'size (default: pooled over all --n samples)')
    p.add_argument('--iters', type=int, default=3)
    p.add_argument('--squeeze', type=int, default=1)
    p.add_argument('--out', default=None, help='write results JSON here')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    from convergence_run import CORPORA, pad_corpus, alignment_accuracy
    from glow_tts_tpu.models.glow_tts import anchored_alignment_path
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import create_train_state, make_eval_step
    from glow_tts_tpu.ops import mas as mas_ops

    rng = np.random.default_rng(0)
    pats = CORPORA[args.corpus](rng)
    data, true_dur, frame_token = pad_corpus(pats, args.squeeze)
    emb = max(35, int(max(p_['tokens'].max() for p_ in pats)) + 1)
    on_tpu = jax.devices()[0].platform == 'tpu'
    cfg = load_config({'Mode': 'Vanilla',
                       'Encoder': {'Embedding_Tokens': emb},
                       'Train': {'Batch_Size': 32},
                       'Decoder': {'Num_Squeeze': args.squeeze},
                       'TPU': {'mas_backend': 'pallas' if on_tpu
                               else 'scan'}})
    init_batch = {k: v[:32] for k, v in data.items() if k != 'noise_sigma'}
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), init_batch)
    with open(args.state, 'rb') as f:
        saved = pickle.load(f)
    state = jax.tree_util.tree_map(jnp.asarray, saved['state'])
    print('# loaded step', saved['step'], flush=True)
    eval_step = jax.jit(make_eval_step(cfg, model))

    N, BS = args.n, 32
    zs, attns = [], []
    for s in range(0, N, BS):
        idx = np.arange(s, s + BS)
        batch = {k: v[idx] for k, v in data.items()}
        sig = batch.pop('noise_sigma')
        ev = np.random.default_rng(1234 + s)
        batch['mels'] = np.clip(
            batch['mels'] + sig * ev.standard_normal(
                batch['mels'].shape).astype(np.float32), -4, 4)
        _, out = eval_step(state, batch)
        zs.append(np.asarray(out['z'], np.float32))
        attns.append(np.asarray(out['attentions'], np.float32))
    z = np.concatenate(zs)
    attn_learned = np.concatenate(attns)
    toks = data['tokens'][:N]
    tl = data['token_lengths'][:N]
    ml = data['mel_lengths'][:N]
    tok_mask = (np.arange(toks.shape[1])[None] < tl[:, None])
    mel_mask = (np.arange(z.shape[1])[None] < ml[:, None])
    attn_mask = (tok_mask[:, :, None] * mel_mask[:, None, :]).astype(
        np.float32)
    results = {'state': args.state, 'corpus': args.corpus, 'n': N,
               'stats_batch': args.stats_batch,
               'learned_prior_mas_acc': round(alignment_accuracy(
                   attn_learned, frame_token[:N], ml), 4)}
    print('learned-prior MAS acc:', results['learned_prior_mas_acc'])

    V, C = emb, z.shape[-1]
    mas_backend = 'pallas' if on_tpu else 'cpp'
    slices = ([np.arange(s, min(s + args.stats_batch, N))
               for s in range(0, N, args.stats_batch)]
              if args.stats_batch else [np.arange(N)])

    def em(path, iters, tag):
        accs = []
        for it in range(iters):
            new_path = np.zeros_like(path)
            for sl in slices:
                owner = path[sl].argmax(axis=1)
                ids = np.take_along_axis(
                    toks[sl], np.minimum(owner, toks.shape[1] - 1), 1)
                flat = ids[mel_mask[sl]]
                s0 = np.zeros((V, C))
                s1 = np.zeros((V, C))
                cnt = np.zeros((V,))
                np.add.at(cnt, flat, 1.0)
                np.add.at(s0, flat, z[sl][mel_mask[sl]])
                np.add.at(s1, flat, z[sl][mel_mask[sl]] ** 2)
                cc = np.maximum(cnt, 1.0)[:, None]
                mu = (s0 / cc).astype(np.float32)
                var = np.maximum(s1 / cc - (s0 / cc) ** 2,
                                 1e-4).astype(np.float32)
                m_tok = mu[toks[sl]]
                inv_v = 1.0 / var[toks[sl]]
                const = (-0.5 * np.log(2 * np.pi * var[toks[sl]])
                         - 0.5 * m_tok ** 2 * inv_v).sum(-1)
                quad = np.einsum('bic,bjc->bij', -0.5 * inv_v, z[sl] ** 2)
                cross = np.einsum('bic,bjc->bij', m_tok * inv_v, z[sl])
                log_p = ((const[:, :, None] + quad + cross)
                         .astype(np.float32) * attn_mask[sl])
                new_path[sl] = np.asarray(mas_ops.maximum_path(
                    jnp.asarray(log_p), jnp.asarray(tl[sl]),
                    jnp.asarray(ml[sl]), backend=mas_backend))
            path = new_path
            acc = round(alignment_accuracy(path, frame_token[:N], ml), 4)
            accs.append(acc)
            print(f'{tag} EM iter {it + 1}: acc {acc}', flush=True)
        return accs

    # (a) from the TRUE path — the oracle ceiling of EM on this z
    true_path = np.zeros_like(attn_mask)
    ft = frame_token[:N]
    for i in range(N):
        fr = np.arange(int(ml[i]))
        true_path[i, np.maximum(ft[i, :int(ml[i])], 0), fr] = 1.0
    results['from_true'] = em(true_path, min(args.iters, 2), 'from-true')
    # (b) from the anchored silence-pinned init (what the curriculum has)
    sid = int(toks.max())
    mels_noisy = np.clip(
        data['mels'][:N] + data['noise_sigma'][:N]
        * np.random.default_rng(7).standard_normal(
            data['noise_sigma'][:N].shape).astype(np.float32), -4, 4)
    anch = np.asarray(anchored_alignment_path(
        jnp.asarray(toks), jnp.asarray(tl), jnp.asarray(mels_noisy),
        jnp.asarray(ml), jnp.asarray(attn_mask), (sid,), -3.5,
        'pallas' if on_tpu else 'scan'))
    results['anchored_init_acc'] = round(alignment_accuracy(
        anch, frame_token[:N], ml), 4)
    print('anchored init acc:', results['anchored_init_acc'])
    results['from_anchored'] = em(anch, args.iters, 'from-anchored')
    if args.out:
        tmp = args.out + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, args.out)
        print('# wrote', args.out)


if __name__ == '__main__':
    main()
