"""Export a convergence-run state as a real product checkpoint and speak.

VERDICT r3 #6: the convergence study (benchmarks/convergence_run.py)
proves alignment lock with its own pickle state; this script closes the
loop to the PRODUCT surface — the first full
train → checkpoint → serve → audio pass:

1. rebuilds the convergence run's exact config + corpus (same seed), loads
   the state pickle, and saves it as an orbax checkpoint directory with a
   ``Hyper_Parameters.yaml`` snapshot — exactly what ``Inferencer``/
   ``glow-tts-infer`` consume (reference ``Inference.py:111-135``);
2. writes the synthetic vocabulary as a ``Token.yaml`` (ids 0/1 =
   ``<S>``/``<E>``, ids 2.. = one unicode letter per corpus token) so the
   standard letter tokenizer (``text.py``) can address the trained
   embedding rows from command-line text;
3. samples corpus patterns, decodes their token ids to text, and runs the
   ``Inferencer`` with Griffin-Lim wav export (``ops/vocoder.py``),
   timing the pass for the RTF figure (vs BASELINE_MEASURED.json);
4. prints the equivalent ``glow-tts-infer -t ... -wav`` command line.

Run (after the v7 lock run saved its state):
    python benchmarks/export_convergence_checkpoint.py \
        --state-file /tmp/v7_state.pkl --corpus v7 \
        --out-dir artifacts/convergence_v7
"""

import argparse
import json
import os
import pickle
import shlex
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def token_char(token_id: int) -> str:
    """Stable one-char unicode name for a synthetic token id ≥ 2 (CJK
    block: dense, printable, single-codepoint)."""
    return chr(0x4E00 + token_id - 2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--state-file', required=True)
    parser.add_argument('--corpus', default='v7')
    parser.add_argument('--out-dir', default='artifacts/convergence_v7')
    parser.add_argument('--num-texts', type=int, default=4)
    parser.add_argument('--seed', type=int, default=0,
                        help='must match the convergence run seed')
    parser.add_argument('--lr', type=float, default=3e-4,
                        help='must match the run (part of the config)')
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--squeeze', type=int, default=None,
                        help='must match the run when it overrode '
                             'Decoder.Num_Squeeze')
    parser.add_argument('--skip-synthesis', action='store_true',
                        help='only export the checkpoint tree')
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    import jax.numpy as jnp

    from benchmarks.convergence_run import CORPORA
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.text import BOS, EOS, save_token_dict
    from glow_tts_tpu.training.checkpoint import CheckpointManager
    from glow_tts_tpu.training.step import create_train_state

    out_dir = os.path.abspath(args.out_dir)
    ckpt_dir = os.path.join(out_dir, 'Checkpoint')
    os.makedirs(out_dir, exist_ok=True)

    # ---- rebuild the run's config + corpus (identical to run()) ---------
    rng = np.random.default_rng(args.seed)
    corpus = CORPORA[args.corpus](rng)
    embedding_tokens = max(
        35, int(max(p['tokens'].max() for p in corpus)) + 1)
    token_path = os.path.join(ckpt_dir, 'Token.yaml')
    cfg = load_config({
        'Mode': 'Vanilla',
        'Encoder': {'Embedding_Tokens': embedding_tokens},
        'Train': {'Batch_Size': args.batch_size,
                  'Learning_Rate': {'Initial': args.lr}},
        **({'Decoder': {'Num_Squeeze': args.squeeze}}
           if args.squeeze else {}),
        'Token_Path': token_path,
        'Inference_Path': os.path.join(out_dir, 'Inference'),
    })

    # ---- token dictionary over the synthetic vocabulary -----------------
    token_dict = {BOS: 0, EOS: 1}
    for tid in range(2, embedding_tokens):
        token_dict[token_char(tid)] = tid
    os.makedirs(ckpt_dir, exist_ok=True)
    save_token_dict(token_dict, token_path)

    # ---- state pickle → orbax checkpoint --------------------------------
    with open(args.state_file, 'rb') as f:
        saved = pickle.load(f)
    step = int(saved['step'])
    # template defines the pytree/classes; the pickle carries the arrays
    init_batch = {
        'tokens': np.stack([np.pad(p['tokens'][:40], (0, 40 - min(
            40, len(p['tokens'])))) for p in corpus[:args.batch_size]]
        ).astype(np.int32),
        'token_lengths': np.asarray(
            [min(40, len(p['tokens'])) for p in corpus[:args.batch_size]],
            np.int32),
        'mels': np.stack([
            np.pad(p['mel'][:64], ((0, 64 - min(64, len(p['mel']))), (0, 0)))
            for p in corpus[:args.batch_size]]).astype(np.float32),
        'mel_lengths': np.asarray(
            [min(64, len(p['mel'])) // cfg.decoder.num_squeeze
             * cfg.decoder.num_squeeze
             for p in corpus[:args.batch_size]], np.int32),
    }
    _, template = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                     init_batch)
    state = jax.tree_util.tree_map(
        lambda tmpl, arr: jnp.asarray(arr).astype(tmpl.dtype)
        if hasattr(tmpl, 'dtype') else arr,
        template, saved['state'])

    manager = CheckpointManager(ckpt_dir, config=cfg)
    manager.save(step, state, wait=True)
    manager.close()
    print(f'# exported step-{step} checkpoint to {ckpt_dir}', flush=True)

    # ---- texts from real corpus patterns --------------------------------
    texts = []
    for p in corpus[:args.num_texts]:
        texts.append(''.join(token_char(int(t)) for t in p['tokens']))
    with open(os.path.join(out_dir, 'texts.txt'), 'w',
              encoding='utf-8') as f:
        f.write('\n'.join(texts) + '\n')
    cmd = (['glow-tts-infer', '-c', ckpt_dir, '-wav',
            '-o', os.path.join(out_dir, 'Inference')]
           + [x for t in texts for x in ('-t', t)])
    print('# CLI equivalent:', ' '.join(shlex.quote(c) for c in cmd),
          flush=True)
    if args.skip_synthesis:
        return

    # ---- serve + Griffin-Lim export + RTF -------------------------------
    from glow_tts_tpu.inference import Inferencer
    inferencer = Inferencer(ckpt_dir, batch_size=max(args.num_texts, 1))
    labels = [f'V7_{i:02d}' for i in range(len(texts))]
    # warm (compile) pass, then the timed pass
    inferencer.inference(labels, texts,
                         out_dir=os.path.join(out_dir, 'Inference'),
                         export_wav=True)
    t0 = time.perf_counter()
    results = inferencer.inference(labels, texts,
                                   out_dir=os.path.join(out_dir,
                                                        'Inference'),
                                   export_wav=True)
    wall = time.perf_counter() - t0
    frames = int(sum(r['mel'].shape[0] for r in results))
    audio_sec = frames * cfg.sound.frame_shift / cfg.sound.sample_rate
    rtf = wall / audio_sec
    summary = {
        'step': step,
        'corpus': args.corpus,
        'num_texts': len(texts),
        'mel_frames': frames,
        'wall_sec': round(wall, 4),
        'audio_sec': round(audio_sec, 4),
        'rtf': round(rtf, 6),
        'device': str(jax.devices()[0]),
        'note': 'includes host-side Griffin-Lim + PNG/NPY export; '
                'mel-only serving throughput is the bench.py headline',
    }
    with open(os.path.join(out_dir, 'rtf.json'), 'w') as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()
