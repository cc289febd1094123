"""Train the LIVE PyTorch reference on the exact convergence-harness corpus.

The alignment-convergence harness (``convergence_run.py``) measures whether
training collapses MAS attention to the true token boundaries.  Absolute
thresholds on a synthetic corpus turn out to measure the corpus as much as
the framework: an exact-likelihood flow races the prior for every bit of
locally-inferable structure (see ``make_corpus``'s docstring).  The
decisive correctness statement is therefore *relative*: train the
reference implementation (``/root/reference``) on the SAME corpus with the
same batch size, noise schedule and metrics, and show both frameworks
produce the same trajectory.  Matching curves ⇒ our training dynamics are
the reference's; any alignment ceiling is a property of the task.

Run:  python benchmarks/reference_convergence.py --steps 2000
Writes benchmarks/reference_convergence.json.  Compare against
``convergence_run.py --batch-size 16 --max-tokens 24`` (the twin run).

Torch on this box is single-core CPU — expect seconds per step; keep
--steps modest.
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE = '/root/reference'

from convergence_run import (CORPORA, MAX_TOK, alignment_accuracy,  # noqa: E402
                             make_corpus, pad_corpus, token_durations)


def load_reference_modules(workdir, embedding_tokens=None):
    """Import the reference with a Vanilla/CPU hp (same bootstrap as the
    fidelity suite, ``tests/test_fidelity.py:26-60``)."""
    import torch
    import yaml
    with open(os.path.join(REFERENCE, 'Hyper_Parameters.yaml'),
              encoding='utf-8') as f:
        hp = yaml.safe_load(f)
    hp['Mode'] = 'Vanilla'
    hp['Use_Cython_Alignment'] = False
    hp['Use_Mixed_Precision'] = False
    hp['Device'] = '-1'
    if embedding_tokens is not None:   # large-vocab corpora (v3x256)
        hp['Encoder']['Embedding_Tokens'] = int(embedding_tokens)
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, 'Hyper_Parameters.yaml'), 'w') as f:
        yaml.safe_dump(hp, f)

    stub = types.ModuleType('Speaker_Embedding')
    stub_modules = types.ModuleType('Speaker_Embedding.Modules')
    stub_modules.Encoder = object
    stub_modules.Normalize = lambda x: x
    sys.modules['Speaker_Embedding'] = stub
    sys.modules['Speaker_Embedding.Modules'] = stub_modules
    if not hasattr(torch, 'qr'):
        torch.qr = lambda a: tuple(torch.linalg.qr(a))

    cwd = os.getcwd()
    os.chdir(workdir)
    sys.path.insert(0, REFERENCE)
    for name in ('Modules', 'RPR_MHA', 'Radam', 'Noam_Scheduler'):
        sys.modules.pop(name, None)
    try:
        import Modules
        import Noam_Scheduler
        import Radam
    finally:
        os.chdir(cwd)
    return Modules, Radam, Noam_Scheduler


def run(steps=2000, eval_every=500, batch_size=16, max_tokens=24, seed=0,
        verbose=True, corpus_name='v3'):
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from glow_tts_tpu.training.trainer import attention_diagonality

    rng = np.random.default_rng(seed)
    corpus = CORPORA[corpus_name](rng)
    # same corpus, short-pattern subset for CPU viability
    keep = [i for i, p in enumerate(corpus)
            if len(p['tokens']) <= max_tokens]
    corpus = [corpus[i] for i in keep]

    Modules, Radam, Noam_Scheduler = load_reference_modules(
        '/tmp/ref_conv_workdir',
        embedding_tokens=max(
            35, int(max(p['tokens'].max() for p in corpus)) + 1))
    data, true_durations, frame_token = pad_corpus(corpus, 2)
    max_mel = int(data['mel_lengths'].max())
    max_mel = ((max_mel + 1) // 2) * 2
    data['mels'] = data['mels'][:, :max_mel]
    data['noise_sigma'] = data['noise_sigma'][:, :max_mel]
    n = len(corpus)
    n_eval = min(n, 128)
    if verbose:
        print(f'# corpus {n} patterns (≤{max_tokens} tokens), '
              f'mel padded to {max_mel}', flush=True)

    torch.manual_seed(seed)
    model = Modules.GlowTTS().train()
    optimizer = Radam.RAdam(model.parameters(), lr=1e-3,
                            betas=(0.9, 0.999), eps=1e-6,
                            weight_decay=1e-6)
    scheduler = Noam_Scheduler.Modified_Noam_Scheduler(
        optimizer=optimizer, base=4000)
    mle_loss = Modules.MLE_Loss()
    mse = torch.nn.MSELoss()

    def to_batch(idx, noise_rng):
        # the reference sizes its masks from lengths.max() — trim padding
        # to the batch maxima
        tl = int(data['token_lengths'][idx].max())
        ml = int(data['mel_lengths'][idx].max())
        mels = data['mels'][idx, :ml].copy()
        sig = data['noise_sigma'][idx, :ml]
        mels = np.clip(
            mels + sig * noise_rng.standard_normal(mels.shape)
            .astype(np.float32), -4.0, 4.0)
        return {
            'tokens': torch.from_numpy(
                data['tokens'][idx, :tl].astype(np.int64)),
            'token_lengths': torch.from_numpy(
                data['token_lengths'][idx].astype(np.int64)),
            'mels': torch.from_numpy(mels).transpose(2, 1),
            'mel_lengths': torch.from_numpy(
                data['mel_lengths'][idx].astype(np.int64)),
        }

    history = []

    def evaluate(step):
        model.eval()
        diags, dur_errs, dur_losses, mles, accs = [], [], [], [], []
        with torch.no_grad():
            for start in range(0, n_eval, batch_size):
                idx = np.arange(start, min(start + batch_size, n_eval))
                ev_rng = np.random.default_rng(1234 + start)
                b = to_batch(idx, ev_rng)
                (z, mean, log_std, log_dets, log_dur, log_dur_tgt,
                 attn, _) = model(
                    tokens=b['tokens'], token_lengths=b['token_lengths'],
                    mels=b['mels'], mel_lengths=b['mel_lengths'],
                    speakers=None, mels_for_ge2e=None, pitches=None)
                attn_np = attn.detach().numpy().astype(np.float32)
                diags.append(attention_diagonality(
                    attn_np, data['token_lengths'][idx],
                    data['mel_lengths'][idx]))
                accs.append(alignment_accuracy(
                    attn_np, frame_token[idx, :attn_np.shape[-1]],
                    data['mel_lengths'][idx]))
                mas_dur = attn_np.sum(axis=-1)
                mas_dur = np.pad(
                    mas_dur, ((0, 0), (0, MAX_TOK - mas_dur.shape[1])))
                tok_mask = (np.arange(MAX_TOK)[None, :]
                            < data['token_lengths'][idx][:, None])
                err = np.abs(mas_dur - true_durations[idx]) * tok_mask
                dur_errs.append(err.sum() / tok_mask.sum())
                dur_losses.append(float(mse(log_dur, log_dur_tgt)))
                mles.append(float(mle_loss(
                    z=z, mean=mean, std=log_std, log_dets=log_dets,
                    lengths=b['mel_lengths'])))
        model.train()
        entry = {'step': step,
                 'diagonality': round(float(np.mean(diags)), 4),
                 'alignment_accuracy': round(float(np.mean(accs)), 4),
                 'mas_duration_abs_err': round(float(np.mean(dur_errs)), 4),
                 'duration_mse': round(float(np.mean(dur_losses)), 5),
                 'mle': round(float(np.mean(mles)), 4)}
        history.append(entry)
        if verbose:
            print(json.dumps(entry), flush=True)
        return entry

    evaluate(0)
    noise_rng = np.random.default_rng(seed + 1)
    batch_rng = np.random.default_rng(seed + 2)
    t0 = time.perf_counter()
    for step in range(1, steps + 1):
        idx = batch_rng.integers(0, n, batch_size)
        b = to_batch(idx, noise_rng)
        (z, mean, log_std, log_dets, log_dur, log_dur_tgt, _, _) = model(
            tokens=b['tokens'], token_lengths=b['token_lengths'],
            mels=b['mels'], mel_lengths=b['mel_lengths'],
            speakers=None, mels_for_ge2e=None, pitches=None)
        loss = mle_loss(z=z, mean=mean, std=log_std, log_dets=log_dets,
                        lengths=b['mel_lengths']) \
            + mse(log_dur, log_dur_tgt)
        optimizer.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=5.0)
        optimizer.step()
        scheduler.step()
        if verbose and step % 50 == 0:
            print(f'# step {step}: '
                  f'{(time.perf_counter() - t0) / step:.2f} s/step, '
                  f'loss {float(loss):.4f}', flush=True)
        if step % eval_every == 0:
            evaluate(step)

    # free-running length prediction vs ground truth (duration head only —
    # lengths depend on nothing else, ``Modules.py:168-175``)
    model.eval()
    ratios = []
    with torch.no_grad():
        for start in range(0, n_eval, batch_size):
            idx = np.arange(start, min(start + batch_size, n_eval))
            tl = int(data['token_lengths'][idx].max())
            tokens = torch.from_numpy(data['tokens'][idx, :tl]
                                      .astype(np.int64))
            tlen = torch.from_numpy(data['token_lengths'][idx]
                                    .astype(np.int64))
            token_masks = model.Mask_Generate(tlen)
            _, _, log_dur, mask = model.layer_Dict['Encoder'](
                tokens, token_masks, None, None)
            durations = torch.ceil(torch.exp(log_dur) * mask).squeeze(1)
            pred = torch.clamp_min(durations.sum(dim=1), 1.0).numpy()
            true = data['mel_lengths'][idx].astype(np.float64)
            ratios.extend((pred / true).tolist())
    free_run_err = float(np.abs(np.asarray(ratios) - 1.0).mean())

    results = {'steps': steps, 'batch_size': batch_size,
               'max_tokens': max_tokens, 'corpus': corpus_name,
               'sec_per_step': round((time.perf_counter() - t0) / steps, 3),
               'free_run_length_abs_rel_err': round(free_run_err, 4),
               'history': history}
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=2000)
    parser.add_argument('--eval-every', type=int, default=500)
    parser.add_argument('--batch-size', type=int, default=16)
    parser.add_argument('--max-tokens', type=int, default=24)
    parser.add_argument('--corpus', default='v3', choices=sorted(CORPORA))
    parser.add_argument('--out', default=None)
    args = parser.parse_args()
    results = run(steps=args.steps, eval_every=args.eval_every,
                  batch_size=args.batch_size, max_tokens=args.max_tokens,
                  corpus_name=args.corpus)
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   'reference_convergence.json')
    with open(out, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != 'history'}))


if __name__ == '__main__':
    main()
