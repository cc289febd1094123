"""Dump and analyse the TPU-compiled HLO of the train step.

Chipless: uses the AOT ``.lower().compile()`` relay (CLAUDE.md), so it can
run while another process holds the chip.  Prints a summary of layout
copies / transposes / reshapes and greps for named ops passed on the CLI.

CLI: python benchmarks/dump_hlo.py [out.hlo] [grep1 grep2 ...]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else '/tmp/train_step.hlo'
    greps = sys.argv[2:]

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import create_train_state, make_train_step

    cfg = load_config({'Mode': 'Vanilla', 'TPU': {'mas_backend': 'pallas'}})
    BATCH, TOKEN_LEN, T_MEL = 32, 128, 768
    rng = np.random.default_rng(0)
    batch = {
        'tokens': rng.integers(0, 35, (BATCH, TOKEN_LEN)).astype(np.int32),
        'token_lengths': np.full((BATCH,), TOKEN_LEN, np.int32),
        'mels': rng.standard_normal((BATCH, T_MEL, 80)).astype(np.float32),
        'mel_lengths': np.full((BATCH,), T_MEL, np.int32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    train_fn = make_train_step(cfg, model)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    compiled = jax.jit(train_fn).lower(state, jb).compile()
    txt = compiled.as_text()
    with open(out_path, 'w') as f:
        f.write(txt)
    print(f'wrote {len(txt)} bytes to {out_path}')

    # Summaries: unfused copies/transposes/reshapes with shapes.
    pat = re.compile(r'^\s*(%?[\w.\-]+) = ([a-z0-9\[\]{}:,()\s]+?) '
                     r'(copy|transpose|reshape|bitcast)\(', re.M)
    counts = {}
    for m in pat.finditer(txt):
        name, shape, op = m.groups()
        shape = shape.strip()
        counts.setdefault(op, []).append((shape, name))
    for op, items in sorted(counts.items()):
        print(f'\n== {op}: {len(items)} instances ==')
        by_shape = {}
        for shape, name in items:
            by_shape.setdefault(shape, []).append(name)
        for shape, names in sorted(by_shape.items(),
                                   key=lambda kv: -len(kv[1]))[:12]:
            print(f'  {len(names):4d} x {shape}   e.g. {names[0]}')

    for g in greps:
        print(f'\n== grep {g!r} ==')
        hits = [ln for ln in txt.splitlines() if g in ln]
        for ln in hits[:8]:
            print(' ', ln.strip()[:300])
        if len(hits) > 8:
            print(f'  ... {len(hits) - 8} more')


if __name__ == '__main__':
    main()
