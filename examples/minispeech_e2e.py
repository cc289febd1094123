"""The "it speaks" artifact: serve a trained MiniSpeech checkpoint
through the product surface and commit the evidence.

Drives the same chain a user of the reference drives
(``/root/reference/Inference.py:171-223``): checkpoint →
``Inferencer.synthesize_items`` → PNG + NPY + Griffin-Lim WAV — plus
three objective checks no reference script has:

* **RTF** (synthesis wall / audio seconds) on the real chip, against the
  measured torch baseline (BASELINE_MEASURED.json, rtf 0.0219).  Two
  numbers: ``rtf_mel`` times ONLY the text->mel synthesis (the surface
  the reference has — it stops at mels, ``README.md:119-124``: wav comes
  from an external vocoder repo), and ``rtf_total_with_vocoder_export``
  adds our built-in single-core Griffin-Lim + PNG/NPY export, a product
  surface the reference lacks entirely;
* **free-run length error**: predicted utterance lengths vs the
  generator's deterministic per-phone durations
  (examples/make_minispeech.py phone_params);
* **phone-signature correlation**: each synthesised phone segment's mean
  mel (sliced by the PREDICTED durations) vs the ETL ground-truth
  signature of that letter pooled from the eval patterns — "the model
  says the right sounds in the right places", measured, not eyeballed.

Usage (chip):  python examples/minispeech_e2e.py \
    [--checkpoint /tmp/minispeech/results/Checkpoint] [--step 0] \
    [--out artifacts/minispeech] [--n 4]
"""

import argparse
import glob
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_texts(pattern_root: str, n: int):
    """Pull n held-out texts (never trained on) + their true mels."""
    files = sorted(glob.glob(os.path.join(pattern_root, '**', '*.PICKLE'),
                             recursive=True))
    items = []
    for f in files:
        if os.path.basename(f) == 'METADATA.PICKLE':
            continue
        with open(f, 'rb') as fh:
            p = pickle.load(fh)
        if 'Text' in p:
            items.append({'label': os.path.basename(f).split('.')[1],
                          'text': p['Text'], 'true_mel': p['Mel']})
        if len(items) >= n:
            break
    return items


def phone_signatures(pattern_root: str, max_files: int = 16):
    """Pooled ground-truth per-letter mean mel from eval patterns, sliced
    by the generator's deterministic durations."""
    from examples.make_minispeech import LETTERS, PAUSE_FRAMES, phone_params
    durs = {ch: phone_params(i)[4] for i, ch in enumerate(LETTERS)}
    sums = {ch: np.zeros(80) for ch in LETTERS}
    counts = {ch: 0 for ch in LETTERS}
    files = [f for f in sorted(glob.glob(
        os.path.join(pattern_root, '**', '*.PICKLE'), recursive=True))
        if os.path.basename(f) != 'METADATA.PICKLE'][:max_files]
    for f in files:
        with open(f, 'rb') as fh:
            p = pickle.load(fh)
        mel, text, pos = p['Mel'], p['Text'], 0
        for ch in text:
            d = PAUSE_FRAMES if ch == ' ' else durs[ch]
            if ch != ' ' and pos + d <= mel.shape[0]:
                sums[ch] += mel[pos + 2:pos + d - 2].mean(axis=0)
                counts[ch] += 1
            pos += d
    return {ch: sums[ch] / max(counts[ch], 1)
            for ch in LETTERS if counts[ch]}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint',
                        default='/tmp/minispeech/results/Checkpoint')
    parser.add_argument('--step', type=int, default=0)
    parser.add_argument('--eval-patterns',
                        default='/tmp/minispeech/patterns/Eval')
    parser.add_argument('--out', default='artifacts/minispeech')
    parser.add_argument('--n', type=int, default=4)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    from examples.make_minispeech import LETTERS, PAUSE_FRAMES, phone_params
    from glow_tts_tpu.inference import Inferencer

    inferencer = Inferencer(args.checkpoint, step=args.step,
                            max_mel_length=1024)
    items = eval_texts(args.eval_patterns, args.n)
    assert items, f'no eval patterns under {args.eval_patterns}'

    # warm the compile, then time text->mel alone (the reference-
    # comparable surface: the torch reference stops at mels, so its
    # measured 0.0219 RTF excludes any vocoder)
    req = [{'label': it['label'], 'text': it['text']} for it in items]
    inferencer.synthesize_items(req)   # warm every token bucket's compile
    t0 = time.perf_counter()
    results = inferencer.synthesize_items(req)
    mel_wall = time.perf_counter() - t0

    # then the full product export (re-synthesises, then adds the
    # host-side Griffin-Lim vocoder + PNG/NPY render on one CPU core —
    # a surface the reference does not have)
    t0 = time.perf_counter()
    results = inferencer.synthesize_items(req, out_dir=args.out,
                                          export_wav=True)
    full_wall = time.perf_counter() - t0

    sound = inferencer.config.sound
    total_frames = sum(r['mel'].shape[0] for r in results)
    audio_sec = total_frames * sound.frame_shift / sound.sample_rate

    durs = {ch: phone_params(i)[4] for i, ch in enumerate(LETTERS)}
    sigs = phone_signatures(args.eval_patterns)
    len_errs, corrs = [], []
    for it, r in zip(items, results):
        expected = sum(PAUSE_FRAMES if ch == ' ' else durs[ch]
                       for ch in it['text'])
        len_errs.append(abs(r['mel'].shape[0] - expected) / expected)
        # slice the synthesised mel by the PREDICTED per-token durations
        # (attention row sums) and correlate each phone's mean spectrum
        # with the corpus ground truth for that letter
        pred_durs = r['attention'].sum(axis=1)        # [T_tok]
        text_tokens = ['<S>'] + list(it['text']) + ['<E>']
        pos = 0
        for tok, d in zip(text_tokens, pred_durs.astype(int)):
            if tok in sigs and d >= 6:
                seg = r['mel'][pos + 2:pos + d - 2].mean(axis=0)
                c = np.corrcoef(seg, sigs[tok])[0, 1]
                corrs.append(float(c))
            pos += int(d)

    summary = {
        'checkpoint_step': int(inferencer.step),
        'n_utterances': len(results),
        'texts': [it['text'] for it in items],
        'mel_synthesis_wall_sec': round(mel_wall, 4),
        'full_export_wall_sec': round(full_wall, 4),
        'audio_seconds': round(audio_sec, 3),
        'rtf_mel': round(mel_wall / audio_sec, 6),
        'rtf_total_with_vocoder_export': round(full_wall / audio_sec, 6),
        'reference_rtf_measured': 0.0219,
        'reference_rtf_surface': 'text->mel only (no vocoder in the '
                                 'reference; README.md:119-124)',
        'free_run_length_rel_err': round(float(np.mean(len_errs)), 4),
        'phone_signature_corr_mean': round(float(np.mean(corrs)), 4),
        'phone_signature_corr_min': round(float(np.min(corrs)), 4),
        'n_phones_checked': len(corrs),
        'device': str(jax.devices()[0]),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, 'summary.json'), 'w') as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
