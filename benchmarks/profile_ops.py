"""Op-level device-time profiling for jitted functions (real TPU).

Captures a ``jax.profiler`` trace around a function, parses the xplane
proto (tensorboard_plugin_profile), and prints device time grouped by XLA
op, plus a regex-bucketed summary.  This is the evidence tool for kernel
work: BENCH numbers are tunnel-dispatch-bound, the xplane is not.

Library use:
    from benchmarks.profile_ops import profile_device_ops
    totals, events = profile_device_ops(fn, *args)   # fn jitted, blocking

CLI: python benchmarks/profile_ops.py   # profiles the flagship inference
"""

import glob
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_xspace(trace_dir):
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:   # proto location varies by image
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(
        os.path.join(trace_dir, 'plugins', 'profile', '*', '*.xplane.pb')))
    if not paths:
        raise FileNotFoundError(f'no xplane.pb under {trace_dir}')
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xspace.ParseFromString(f.read())
    return xspace


def parse_device_ops(trace_dir):
    """→ list of (op_name, total_ps, count) summed over TPU 'XLA Ops' lines."""
    xspace = _load_xspace(trace_dir)
    totals = defaultdict(lambda: [0, 0])
    for plane in xspace.planes:
        if 'TPU' not in plane.name or 'Host' in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if 'XLA Ops' not in line.name:
                continue
            for event in line.events:
                name = meta[event.metadata_id].name
                totals[name][0] += event.duration_ps
                totals[name][1] += 1
    return sorted(((k, v[0], v[1]) for k, v in totals.items()),
                  key=lambda t: -t[1])


def profile_device_ops(fn, *args, iters=3, trace_dir=None):
    """Run ``fn(*args)`` under a profiler trace; return (op totals, total_ps).

    fn must block on its own result (or return arrays we can block on).
    """
    import jax
    trace_dir = trace_dir or tempfile.mkdtemp(prefix='jaxprof_')
    out = fn(*args)                       # warm/compile outside the trace
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    ops = parse_device_ops(trace_dir)
    total = sum(t for _, t, _ in ops)
    return ops, total


def bucket(ops, patterns):
    """Group op totals by first-matching regex; returns {label: ps}."""
    out = defaultdict(int)
    for name, ps, _ in ops:
        for label, pat in patterns:
            if re.search(pat, name):
                out[label] += ps
                break
        else:
            out['other'] += ps
    return dict(out)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import (create_train_state,
                                            make_inference_step)

    BATCH, TOKEN_LEN, MAX_MEL = 32, 128, 1152
    cfg = load_config({'Mode': 'Vanilla', 'TPU': {'mas_backend': 'pallas'}})
    rng = np.random.default_rng(0)
    init_batch = {
        'tokens': rng.integers(0, 35, (BATCH, TOKEN_LEN)).astype(np.int32),
        'token_lengths': np.full((BATCH,), TOKEN_LEN, np.int32),
        'mels': rng.standard_normal((BATCH, 256, 80)).astype(np.float32),
        'mel_lengths': np.full((BATCH,), 256, np.int32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), init_batch)
    batch = {'tokens': init_batch['tokens'],
             'token_lengths': init_batch['token_lengths'],
             'length_scales': np.full((BATCH,), 8.0, np.float32)}
    infer_fn = make_inference_step(cfg, model, max_mel_length=MAX_MEL)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    @jax.jit
    def chained(state, key0):
        def body(i, carry):
            key = jax.random.fold_in(key0, i + (carry.astype(jnp.int32) & 1))
            out = infer_fn(state, jb, key)
            return carry + out['mels'].astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, 10, body, jnp.zeros([], jnp.float32))

    def run(s):
        out = chained(s, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        return out

    ops, total = profile_device_ops(run, state, iters=1)
    print(f'total device time: {total / 1e9:.3f} ms '
          f'(10 chained batches)')
    for name, ps, count in ops[:30]:
        print(f'{ps / 1e9:9.3f} ms  {100 * ps / total:5.1f}%  ×{count:<5d} '
              f'{name}')


if __name__ == '__main__':
    main()
