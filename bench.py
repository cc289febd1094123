"""Headline benchmark: mel frames/sec on one TPU chip, Vanilla inference.

Protocol mirrors the measured reference baseline
(benchmarks/measure_reference.py → BASELINE_MEASURED.json): batch 32,
128-token inputs, length_scale 8 (≈8 frames/token from the untrained
duration predictor on both sides), full inference path (text encoder →
durations → path → sampled latent → inverse flow).

Output protocol (un-losable by construction):

* a PRELIMINARY headline JSON line is printed the moment the cheap
  host-pipelined number exists — before any enrichment section compiles
  anything, so a crash, tunnel flake or driver timeout later cannot
  lose the run entirely;
* the first enrichment section re-measures the headline with the
  device-side chained-carry protocol (CLAUDE.md benchmarking pitfalls:
  host-pipelined timings through the axon tunnel are noisy and have
  measured BELOW blocking latency — the chained protocol is the truth)
  and immediately re-prints the headline line with
  ``extra.headline_protocol = 'device_chained'``;
* every section (device chain, per-mode infer, train MFU, per-mode
  train, fast mode — in that order, so the four-mode capability matrix
  cannot be starved by the train chain's compile) runs in its own
  try/except and respects a wall-clock budget
  (``GLOWTTS_BENCH_BUDGET_SECS``, default 900): a failing or skipped
  section is recorded in ``extra.section_errors`` / ``extra.skipped``
  instead of killing the run;
* the final, enriched JSON line is printed last — a driver that parses
  the last JSON line gets the best available protocol.

The JSON carries ``vs_previous``: each captured metric vs the last
round's committed value (BENCH_r02.json as of round 4), so a >10 %
regression is visible in the artifact itself.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 32
TOKEN_LEN = 128
LENGTH_SCALE = 8.0
MAX_MEL = 1152          # capacity ≥ ceil(e^0·8)·128 = 1024 frames
WARMUP = 3
ITERS = 10

# peak dense-compute throughput per chip (bf16), for the MFU estimate
_PEAK_FLOPS = {
    'TPU v5 lite': 197e12,      # v5e
    'TPU v5': 459e12,           # v5p
    'TPU v4': 275e12,
    'TPU v6 lite': 918e12,      # v6e / Trillium
}

_REPO = os.path.dirname(os.path.abspath(__file__))


def _peak_flops(device) -> float:
    kind = getattr(device, 'device_kind', '')
    for name, peak in _PEAK_FLOPS.items():
        if kind.startswith(name):
            return peak
    return 0.0


def _compiled_flops(compiled) -> float:
    """Model FLOPs per step from XLA's own cost analysis of the compiled
    executable (robust across jax versions returning dict or [dict])."""
    try:
        cost = compiled.cost_analysis()
    except Exception:
        return 0.0
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get('flops', 0.0) or 0.0)


def _wait_for_backend(max_wait: float) -> bool:
    """Probe jax backend init in a subprocess until it answers or
    ``max_wait`` expires.

    A down axon tunnel makes the first device query hang indefinitely
    *in-process* (observed >150 s with no exception), which would turn a
    transient tunnel outage into a hung benchmark run.  The subprocess
    probe can be timed out and retried; on CPU it returns immediately.
    """
    import subprocess
    probe = ("import jax, jax.numpy as jnp;"
             "print('BENCH_OK', float(jnp.ones((8, 8)).sum()))")
    deadline = time.monotonic() + max_wait
    while True:
        try:
            r = subprocess.run([sys.executable, '-c', probe],
                               capture_output=True, timeout=150)
            if b'BENCH_OK' in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print('bench: device backend unreachable, retrying...',
              file=sys.stderr)
        time.sleep(30)


def main():
    # Bounded wait for the device backend (GLOWTTS_BENCH_WAIT_SECS, 0 to
    # skip): emit one honest JSON error line instead of hanging forever
    # if the TPU tunnel is down when the benchmark fires.
    wait_secs = float(os.environ.get('GLOWTTS_BENCH_WAIT_SECS', '900'))
    if wait_secs > 0 and not _wait_for_backend(wait_secs):
        print(json.dumps({
            'metric': 'mel_frames_per_sec_per_chip',
            'value': None, 'unit': 'frames/s', 'vs_baseline': None,
            'extra': {'error': 'device backend unreachable after '
                               f'{wait_secs:.0f}s of probing'},
        }), flush=True)
        return 1

    budget = float(os.environ.get('GLOWTTS_BENCH_BUDGET_SECS', '900'))
    t_start = time.monotonic()

    def remaining() -> float:
        return budget - (time.monotonic() - t_start)

    import jax
    import jax.numpy as jnp
    # Reuse compiled executables across bench invocations.  Must go through
    # jax.config (a sitecustomize pre-imports jax, so the
    # JAX_COMPILATION_CACHE_DIR env var is read too early to set here).
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(_REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.step import (
        create_train_state, make_inference_step)

    on_tpu = jax.devices()[0].platform == 'tpu'
    cfg = load_config({
        'Mode': 'Vanilla',
        'TPU': {'mas_backend': 'pallas' if on_tpu else 'scan'},
    })

    rng = np.random.default_rng(0)
    s = cfg.decoder.num_squeeze
    init_batch = {
        'tokens': rng.integers(0, cfg.encoder.embedding_tokens,
                               (BATCH, TOKEN_LEN)).astype(np.int32),
        'token_lengths': np.full((BATCH,), TOKEN_LEN, np.int32),
        'mels': rng.standard_normal((BATCH, 256, cfg.sound.mel_dim)
                                    ).astype(np.float32),
        'mel_lengths': np.full((BATCH,), 256 // s * s, np.int32),
    }
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), init_batch)

    batch = {
        'tokens': init_batch['tokens'],
        'token_lengths': init_batch['token_lengths'],
        'length_scales': np.full((BATCH,), LENGTH_SCALE, np.float32),
    }
    infer = jax.jit(make_inference_step(cfg, model, max_mel_length=MAX_MEL))
    key = jax.random.PRNGKey(1)

    # ===================== headline (printed immediately) =================
    print(f'bench: headline warmup ({remaining():.0f}s budget left)',
          file=sys.stderr)
    for _ in range(WARMUP):
        out = infer(state, batch, key)
    jax.block_until_ready(out)
    frames = int(np.asarray(out['mel_lengths']).sum())

    # throughput: steady-state pipelined issue (async dispatch overlaps the
    # host→device round trip with device compute, as a serving loop would)
    outs = []
    t0 = time.perf_counter()
    for i in range(ITERS):
        outs.append(infer(state, batch, jax.random.fold_in(key, i)))
    # device-ordered scalar readback: dispatches after every queued op and
    # cannot complete early (block_until_ready alone has been observed to
    # signal early through the axon tunnel — CLAUDE.md timing traps)
    float(jnp.sum(outs[-1]['mels']))
    pipelined = (time.perf_counter() - t0) / ITERS
    frames_per_sec = frames / pipelined

    # latency: block on every call (includes the full dispatch round trip)
    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        out = infer(state, batch, jax.random.fold_in(key, i))
        float(jnp.sum(out['mels']))
        times.append(time.perf_counter() - t0)
    latency = min(times)
    audio_sec = frames * cfg.sound.frame_shift / cfg.sound.sample_rate
    rtf = pipelined / audio_sec

    vs_baseline = None
    baseline_path = os.path.join(_REPO, 'BASELINE_MEASURED.json')
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        vs_baseline = frames_per_sec / baseline['mel_frames_per_sec']

    extra = {
        'device': str(jax.devices()[0]),
        'batch': BATCH,
        'seconds_per_batch': round(pipelined, 5),
        'latency_sec_per_batch': round(latency, 5),
        'mel_frames': frames,
        'rtf': round(rtf, 6),
        'compute_dtype': cfg.tpu.compute_dtype,
        'coupling_backend': cfg.tpu.coupling_backend,
        'inference_policy': f'{cfg.tpu.inference_dtype}+'
                            f'{cfg.tpu.inference_matmul_precision}',
        'headline_protocol': 'host_pipelined (preliminary)',
        # r01's 1.73M headline used the tunnel-pipelined protocol, which
        # has measured below physically-possible latency (CLAUDE.md
        # timing traps) — it is NOT comparable; the honest device-chained
        # series starts at r02 (1.21M).
        'protocol_note': 'r01 headline used the tunnel-pipelined '
                         'protocol and is not comparable; the honest '
                         'baseline series starts at r02',
        'skipped': [],
        'section_errors': {},
    }
    result = {
        'metric': 'mel_frames_per_sec_per_chip',
        'value': round(frames_per_sec, 1),
        'unit': 'frames/s',
        'vs_baseline': round(vs_baseline, 2) if vs_baseline else None,
        'extra': extra,
    }
    # the un-losable preliminary headline: whatever happens after this
    # line, the driver's capture has a parseable result
    print(json.dumps(result), flush=True)

    # ===================== enrichment sections ============================

    def section_fast():
        # fast mode: bf16 activations + 1-pass MXU (MAE ~4e-2 — for use
        # cases that trade fidelity for throughput; the headline above runs
        # the default fidelity-grade policy, MAE 7.7e-5)
        import dataclasses
        cfg_fast = dataclasses.replace(cfg, tpu=dataclasses.replace(
            cfg.tpu, inference_dtype='bfloat16',
            inference_matmul_precision='default'))
        infer_fast = jax.jit(make_inference_step(
            cfg_fast, model, max_mel_length=MAX_MEL))
        out = infer_fast(state, batch, key)
        jax.block_until_ready(out)
        outs = []
        t0 = time.perf_counter()
        for i in range(ITERS):
            outs.append(infer_fast(state, batch, jax.random.fold_in(key, i)))
        float(jnp.sum(outs[-1]['mels']))        # ordered scalar readback
        fast_fps = frames / ((time.perf_counter() - t0) / ITERS)
        extra['fast_mode_frames_per_sec'] = round(fast_fps, 1)

    def section_device():
        # device-side inference time (excludes host/tunnel dispatch): chain
        # iterations through a carried scalar so XLA cannot hoist or overlap
        # them; measures the true on-chip batch latency.
        CHAIN_DEV = 30           # 10 left ~3.5 ms/step of tunnel dispatch
        infer_fn = make_inference_step(cfg, model, max_mel_length=MAX_MEL)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        # the carry must consume the produced mels, not just mel_lengths —
        # lengths depend only on the encoder, so a lengths-only carry lets
        # XLA dead-code-eliminate the entire inverse flow (measured: 2.7 ms
        # "device time" vs 13.5 ms real full-path time)
        @jax.jit
        def chained_inference(state, key0):
            def body(i, carry):
                frames, checksum = carry
                key = jax.random.fold_in(
                    key0, i + (checksum.astype(jnp.int32) & 1))
                out = infer_fn(state, jb, key)
                return (frames + out['mel_lengths'].sum().astype(jnp.float32),
                        checksum + out['mels'].astype(jnp.float32).mean())
            zero = jnp.zeros([], jnp.float32)
            return jax.lax.fori_loop(0, CHAIN_DEV, body, (zero, zero))

        total = chained_inference(state, key)
        jax.block_until_ready(total)
        t0 = time.perf_counter()
        total = chained_inference(state, key)
        frames_total = float(np.asarray(total[0]))   # readback in region
        device_sec = (time.perf_counter() - t0) / CHAIN_DEV
        device_fps = (frames_total / CHAIN_DEV) / device_sec
        extra['device_side_sec_per_batch'] = round(device_sec, 5)
        extra['device_side_frames_per_sec'] = round(device_fps, 1)
        # promote to headline: the chained-carry figure is the defensible
        # per-chip number (host-pipelined timings through the tunnel have
        # measured BELOW the blocking latency — pure dispatch noise)
        extra['host_pipelined_frames_per_sec'] = result['value']
        extra['headline_protocol'] = 'device_chained'
        result['value'] = round(device_fps, 1)
        if vs_baseline is not None:
            result['vs_baseline'] = round(
                device_fps / baseline['mel_frames_per_sec'], 2)
        print(json.dumps(result), flush=True)

    def section_train():
        from glow_tts_tpu.training.step import make_train_step
        t_mel = 768
        train_batch = {
            'tokens': init_batch['tokens'],
            'token_lengths': init_batch['token_lengths'],
            'mels': rng.standard_normal((BATCH, t_mel, cfg.sound.mel_dim)
                                        ).astype(np.float32),
            'mel_lengths': np.full((BATCH,), t_mel // s * s, np.int32),
        }
        # chain CHAIN steps through the carried state inside one jit so the
        # timing is device-side (per-dispatch tunnel latency amortised away)
        # and XLA cannot overlap or hoist the iterations.  100 steps per
        # dispatch: the ~35 ms tunnel dispatch adds 3.5 ms/step at 10 and
        # 1.2 at 30; at 100 it is ~0.35 ms/step, and the figure matches
        # the xplane while-loop wall (23.4 ms/step, round 3) and the
        # 30-vs-120-chain slope (23.5) to within 2 %.
        CHAIN = 100
        train_fn = make_train_step(cfg, model)
        jb_train = {k: jnp.asarray(v) for k, v in train_batch.items()}
        _, metrics_shape = jax.eval_shape(train_fn, state, jb_train)
        zero_metrics = jax.tree_util.tree_map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype), metrics_shape)

        @jax.jit
        def chained_train(st):
            return jax.lax.fori_loop(
                0, CHAIN, lambda i, carry: train_fn(carry[0], jb_train),
                (st, zero_metrics))

        compiled = chained_train.lower(state).compile()
        # XLA cost analysis counts a while-loop body ONCE, not ×trip-count
        # (verified here: the 10-step chained executable reports the same
        # total flops as a single-step compile), so the chained total IS the
        # per-step figure.
        train_flops = _compiled_flops(compiled)
        out = compiled(state)                    # warm (reuses the lowering)
        jax.block_until_ready(out)
        train_frames = int(train_batch['mel_lengths'].sum())
        # best-of-2 with a scalar loss readback inside the timed region
        # (readback cannot complete before the device does — guards
        # against the axon early-readiness trap, CLAUDE.md)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = compiled(out[0])
            float(np.asarray(out[1]['total']))
            times.append(time.perf_counter() - t0)
        train_sec = min(times) / CHAIN
        extra['train_sec_per_step'] = round(train_sec, 5)
        extra['train_frames_per_sec'] = round(train_frames / train_sec, 1)
        extra['train_loss'] = round(float(np.asarray(out[1]['total'])), 4)
        extra['train_flops_per_step'] = train_flops
        peak = _peak_flops(jax.devices()[0])
        if train_flops and peak:
            extra['train_mfu'] = round(train_flops / train_sec / peak, 4)

    # per-mode throughput: SE-LUT / SE-GE2E / PE / GR.  Reference
    # capability is four modes (``Modules.py:22-48``); a perf regression
    # in any conditioning encoder (GE2E LSTM, GST conv/GRU stack, pitch
    # interpolation) must surface in BENCH_rN.  Split into a cheap
    # infer-only pass (runs BEFORE the train chain — VERDICT r4 Missing
    # #3: the r04 ordering starved the modes section entirely) and a
    # train pass after the headline-MFU section.
    MODE_SPECS = [
        ('SE_LUT', {'Mode': 'SE'}),
        ('SE_GE2E', {'Mode': 'SE', 'Speaker_Embedding': {'Type': 'GE2E'}}),
        ('PE', {'Mode': 'PE'}),
        ('GR', {'Mode': 'GR'}),
    ]
    _mode_cache = {}
    modes = {}
    extra['modes'] = modes
    CHAIN_M = 15             # 5 left ~7 ms/step of tunnel dispatch

    def _prep_mode(mode_name, overrides):
        if mode_name in _mode_cache:
            return _mode_cache[mode_name]
        mcfg = load_config({
            **overrides,
            'TPU': {'mas_backend': 'pallas' if on_tpu else 'scan'}})
        mb_init = dict(init_batch)
        mb_infer = {
            'tokens': batch['tokens'],
            'token_lengths': batch['token_lengths'],
            'length_scales': batch['length_scales'],
        }
        if mcfg.uses_speaker_embedding or mcfg.uses_gradient_reversal:
            mb_init['speakers'] = (
                np.arange(BATCH, dtype=np.int32)
                % mcfg.speaker_embedding.num_speakers)
            if mcfg.speaker_embedding.type.upper() == 'LUT':
                mb_infer['speakers'] = mb_init['speakers']
            else:
                ge2e = mcfg.speaker_embedding.ge2e.inference
                ge2e_mels = rng.standard_normal(
                    (BATCH * ge2e.samples, ge2e.slice_length,
                     mcfg.sound.mel_dim)).astype(np.float32)
                mb_init['mels_for_ge2e'] = ge2e_mels
                mb_infer['mels_for_ge2e'] = ge2e_mels
        if mcfg.uses_prosody_encoder:
            mb_infer['mels_for_prosody'] = rng.standard_normal(
                (BATCH, 256, mcfg.sound.mel_dim)).astype(np.float32)
            mb_infer['mel_lengths_for_prosody'] = np.full(
                (BATCH,), 256, np.int32)
        if mcfg.uses_gradient_reversal:
            mb_init['pitches'] = rng.random(
                (BATCH, mb_init['mels'].shape[1])).astype(np.float32)
            mb_infer['pitches'] = rng.random(
                (BATCH, 256)).astype(np.float32)
            mb_infer['pitch_lengths'] = np.full((BATCH,), 256, np.int32)

        mmodel, mstate = create_train_state(
            mcfg, jax.random.PRNGKey(0), mb_init)
        _mode_cache[mode_name] = (mcfg, mmodel, mstate, mb_init, mb_infer)
        return _mode_cache[mode_name]

    def section_modes_infer():
        for mode_name, overrides in MODE_SPECS:
            if remaining() < 60:
                extra['skipped'].append(f'modes:{mode_name}')
                continue
            mcfg, mmodel, mstate, _, mb_infer = _prep_mode(
                mode_name, overrides)
            minfer_fn = make_inference_step(mcfg, mmodel,
                                            max_mel_length=MAX_MEL)
            jbm = {k: jnp.asarray(v) for k, v in mb_infer.items()}

            @jax.jit
            def chained_mode_infer(st, key0, _fn=minfer_fn, _jb=jbm):
                def body(i, carry):
                    frames, checksum = carry
                    key = jax.random.fold_in(
                        key0, i + (checksum.astype(jnp.int32) & 1))
                    out = _fn(st, _jb, key)
                    return (frames
                            + out['mel_lengths'].sum().astype(jnp.float32),
                            checksum
                            + out['mels'].astype(jnp.float32).mean())
                zero = jnp.zeros([], jnp.float32)
                return jax.lax.fori_loop(0, CHAIN_M, body, (zero, zero))

            total = chained_mode_infer(mstate, key)
            jax.block_until_ready(total)
            t0 = time.perf_counter()
            total = chained_mode_infer(mstate, key)
            m_frames = float(np.asarray(total[0]))  # readback in region
            m_sec = (time.perf_counter() - t0) / CHAIN_M
            m_fps = m_frames / CHAIN_M / m_sec
            modes.setdefault(mode_name, {}).update({
                'infer_frames_per_sec': round(m_fps, 1),
                'infer_sec_per_batch': round(m_sec, 5)})

    def section_modes_train():
        from glow_tts_tpu.training.step import make_train_step
        t_mel_train = 768
        for mode_name, overrides in MODE_SPECS:
            if remaining() < 90:
                extra['skipped'].append(f'modes:{mode_name}:train')
                continue
            mcfg, mmodel, mstate, mb_init, _ = _prep_mode(
                mode_name, overrides)
            mb_train = dict(mb_init)
            mb_train['mels'] = rng.standard_normal(
                (BATCH, t_mel_train, mcfg.sound.mel_dim)
            ).astype(np.float32)
            mb_train['mel_lengths'] = np.full(
                (BATCH,), t_mel_train // s * s, np.int32)
            if 'pitches' in mb_train:
                mb_train['pitches'] = rng.random(
                    (BATCH, t_mel_train)).astype(np.float32)
            mtrain_fn = make_train_step(mcfg, mmodel)
            jbt = {k: jnp.asarray(v) for k, v in mb_train.items()}
            _, mshape = jax.eval_shape(mtrain_fn, mstate, jbt)
            zero_m = jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), mshape)

            @jax.jit
            def chained_mode_train(st, _fn=mtrain_fn, _jb=jbt,
                                   _zm=zero_m):
                return jax.lax.fori_loop(
                    0, CHAIN_M, lambda i, c: _fn(c[0], _jb),
                    (st, _zm))

            out_t = chained_mode_train(mstate)
            jax.block_until_ready(out_t)
            t0 = time.perf_counter()
            out_t = chained_mode_train(out_t[0])
            m_loss = float(np.asarray(out_t[1]['total']))
            modes.setdefault(mode_name, {}).update({
                'train_sec_per_step': round(
                    (time.perf_counter() - t0) / CHAIN_M, 5),
                'train_loss': round(m_loss, 4)})

    # device first (it refines the headline), then the cheap per-mode
    # inference chains (the capability matrix must not starve — VERDICT
    # r4 #3), then train (the MFU deliverable), then per-mode train;
    # fast is the budget-sacrificial tail
    sections = [
        ('device', section_device, 'GLOWTTS_BENCH_DEVICE'),
        ('modes_infer', section_modes_infer, 'GLOWTTS_BENCH_MODES'),
        ('train', section_train, 'GLOWTTS_BENCH_TRAIN'),
        ('modes_train', section_modes_train, 'GLOWTTS_BENCH_MODES'),
        ('fast', section_fast, 'GLOWTTS_BENCH_FAST'),
    ]
    for name, fn, env in sections:
        if os.environ.get(env, '1') == '0':
            continue
        if remaining() < 120:
            extra['skipped'].append(name)
            print(f'bench: skipping {name} '
                  f'({remaining():.0f}s budget left)', file=sys.stderr)
            continue
        print(f'bench: section {name} ({remaining():.0f}s budget left)',
              file=sys.stderr)
        try:
            fn()
        except Exception as e:          # noqa: BLE001 — record, never die
            extra['section_errors'][name] = repr(e)[:500]
            print(f'bench: section {name} failed: {e!r}', file=sys.stderr)

    # ---- vs_previous: last round's committed values (regression guard) ---
    prev_path = os.path.join(_REPO, 'BENCH_PREV.json')
    try:
        if os.path.exists(prev_path):
            with open(prev_path) as f:
                prev = json.load(f)
            vs_prev = {}
            px = prev.get('extra') or {}
            # like-for-like: once the headline is the device-chained
            # figure, compare against the previous round's device-side
            # number, not its noisy host-pipelined headline
            prev_headline = (px.get('device_side_frames_per_sec')
                             if extra.get('headline_protocol')
                             == 'device_chained' else prev.get('value'))
            if prev_headline:
                vs_prev['mel_frames_per_sec'] = round(
                    result['value'] / prev_headline, 3)
            for key_name, higher_better in [
                    ('fast_mode_frames_per_sec', True),
                    ('device_side_frames_per_sec', True),
                    ('train_frames_per_sec', True),
                    ('train_mfu', True),
                    ('train_sec_per_step', False)]:
                a, b = extra.get(key_name), px.get(key_name)
                if a and b:
                    vs_prev[key_name] = round(a / b, 3)
            extra['vs_previous'] = vs_prev
            extra['vs_previous_source'] = prev.get('source', 'BENCH_PREV')
    except Exception as e:              # noqa: BLE001
        extra['section_errors']['vs_previous'] = repr(e)[:200]

    if not extra['section_errors']:
        del extra['section_errors']
    if not extra['skipped']:
        del extra['skipped']
    if not extra['modes']:
        del extra['modes']
    print(json.dumps(result), flush=True)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
