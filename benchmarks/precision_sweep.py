"""Selective-precision design experiment (real TPU).

North star (BASELINE.json): inference mel MAE < 1e-3 vs the fp32 torch
reference at production speed.  The TPU MXU's single-pass bf16 input
rounding costs ~8e-3 MAE; full fp32 emulation ('highest', 6 passes) reaches
~1e-5 but costs 3-6x matmul throughput.  This script measures the middle of
that curve — the 3-pass 'tensorfloat32' mode and scoping fp32 to the
inference path only — to pick the policy for ``TPU.inference_matmul_precision``.

Protocol: import a freshly-initialised live-reference model's weights
(random weights expose layout/precision error as well as trained ones, cf.
tests/test_fidelity.py), run the torch fp32 inference once on CPU at the
bench shapes (batch 32, 128 tokens, length_scale 8, noise 0), then run our
inference on the TPU once per precision and report per-sample mel MAE plus
device-side batch time (10 calls chained through a carry in one
executable).

Usage: python benchmarks/precision_sweep.py
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = '/root/reference'
BATCH = 32
TOKEN_LEN = 128
LENGTH_SCALE = 8.0
MAX_MEL = 1152
CHAIN = 10


def build_torch_reference(workdir):
    """Construct the live reference GlowTTS (Vanilla, CPU, GE2E stubbed)."""
    import torch
    import yaml
    with open(os.path.join(REFERENCE, 'Hyper_Parameters.yaml'),
              encoding='utf-8') as f:
        hp = yaml.safe_load(f)
    hp['Mode'] = 'Vanilla'
    hp['Use_Cython_Alignment'] = False
    hp['Device'] = '-1'
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
    sys.modules.pop('Modules', None)
    sys.modules.pop('RPR_MHA', None)
    try:
        import Modules
    finally:
        os.chdir(cwd)

    torch.manual_seed(7)
    tmodel = Modules.GlowTTS().eval()
    for module in tmodel.modules():
        if isinstance(module, Modules.Activation_Norm):
            module.initialized = True
            with torch.no_grad():
                module.logs.uniform_(-0.3, 0.3)
                module.bias.uniform_(-0.5, 0.5)
    return tmodel


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    import torch
    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.models.glow_tts import GlowTTS
    from glow_tts_tpu.utils.torch_import import convert_reference_state_dict

    tmodel = build_torch_reference('/tmp/precision_sweep_ref')

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 35, (BATCH, TOKEN_LEN)).astype(np.int64)
    token_lengths = np.full((BATCH,), TOKEN_LEN, np.int64)

    t0 = time.perf_counter()
    with torch.no_grad():
        t_mels, t_lengths, _ = tmodel.inference(
            tokens=torch.from_numpy(tokens),
            token_lengths=torch.from_numpy(token_lengths),
            mels_for_prosody=None, mel_lengths_for_prosody=None,
            speakers=None, mels_for_ge2e=None,
            pitches=None, pitch_lengths=None,
            noise_scale=0.0,
            length_scale=torch.full((BATCH,), LENGTH_SCALE))
    torch_sec = time.perf_counter() - t0
    t_mels_np = t_mels.numpy().transpose(0, 2, 1)       # [B, T, M]
    print(f'# torch fp32 CPU reference: {torch_sec:.1f}s, '
          f'{int(t_lengths.sum())} frames')

    cfg = load_config({'Mode': 'Vanilla', 'TPU': {'mas_backend': 'pallas'}})
    params = jax.device_put(                      # keep weights on-device:
        convert_reference_state_dict(tmodel.state_dict(), cfg))

    jtokens = jnp.asarray(tokens, jnp.int32)
    jtoken_lengths = jnp.asarray(token_lengths, jnp.int32)

    def make_infer(dtype, precision, enc_precision=None, dec_precision=None):
        import dataclasses
        mcfg = cfg
        if enc_precision or dec_precision:
            mcfg = dataclasses.replace(cfg, tpu=dataclasses.replace(
                cfg.tpu,
                inference_encoder_matmul_precision=enc_precision,
                inference_decoder_matmul_precision=dec_precision))
        model = GlowTTS(mcfg, dtype=jnp.dtype(dtype))

        def run(p, key):
            with jax.default_matmul_precision(precision):
                return model.apply(
                    {'params': p},
                    tokens=jtokens, token_lengths=jtoken_lengths,
                    noise_key=key, noise_scale=0.0,
                    length_scale=LENGTH_SCALE, max_mel_length=MAX_MEL,
                    method=GlowTTS.inference)
        return run

    if '--scoped' in sys.argv:
        # per-stage attribution: where does the 1-pass error live, and how
        # cheap can the stage that doesn't carry it run?  rows are
        # (activation dtype, encoder precision, decoder precision); the
        # ambient precision is set to the decoder's (the decoder dominates
        # FLOPs; the encoder scope overrides its stage explicitly).
        GRID = [
            ('float32', 'tensorfloat32', 'tensorfloat32'),   # baseline
            ('float32', 'tensorfloat32', 'bfloat16'),
            ('float32', 'bfloat16', 'tensorfloat32'),
            ('float32', 'float32', 'bfloat16'),
            ('bfloat16', 'tensorfloat32', 'bfloat16'),
        ]
    else:
        GRID = [                   # (activation dtype, matmul precision)
            ('bfloat16', 'bfloat16'),          # production default
            ('float32', 'bfloat16'),           # f32 activations, 1-pass MXU
            ('float32', 'tensorfloat32'),      # f32 activations, 3-pass MXU
            ('float32', 'float32'),            # full fp32 emulation (6-pass)
        ]
    results = []
    for row in GRID:
        if len(row) == 3:
            dtype, enc_p, dec_p = row
            precision = dec_p
            infer = make_infer(dtype, precision,
                               enc_precision=enc_p, dec_precision=dec_p)
        else:
            dtype, precision = row
            enc_p = dec_p = None
            infer = make_infer(dtype, precision)
        out = jax.jit(infer)(params, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        j_mels = np.asarray(out['mels'], np.float32)
        j_lengths = np.asarray(out['mel_lengths'])

        maes = []
        for i in range(BATCH):
            n = min(int(j_lengths[i]), t_mels_np.shape[1])
            maes.append(np.abs(j_mels[i, :n] - t_mels_np[i, :n]).mean())
        mae = float(np.mean(maes))
        mae_max = float(np.max(maes))

        # device-side time: chain calls through a carry in one executable;
        # the carry consumes the mels (a lengths-only carry would let XLA
        # dead-code-eliminate the whole inverse flow)
        @jax.jit
        def chained(p, key0):
            def body(i, carry):
                key = jax.random.fold_in(
                    key0, i + (carry.astype(jnp.int32) & 1))
                o = infer(p, key)
                return carry + o['mels'].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, CHAIN, body,
                                     jnp.zeros([], jnp.float32))

        total = chained(params, jax.random.PRNGKey(1))
        jax.block_until_ready(total)
        device_sec = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            total = chained(params, jax.random.PRNGKey(1))
            jax.block_until_ready(total)
            device_sec = min(device_sec, (time.perf_counter() - t0) / CHAIN)

        entry = {'dtype': dtype, 'precision': precision,
                 'mel_mae': mae, 'mel_mae_max': mae_max,
                 'device_sec_per_batch': round(device_sec, 5)}
        if enc_p is not None:
            entry['encoder_precision'] = enc_p
            entry['decoder_precision'] = dec_p
        results.append(entry)
        print(json.dumps(results[-1]))

    base = results[0]['device_sec_per_batch']
    for r in results:
        r['slowdown'] = round(r['device_sec_per_batch'] / base, 2)
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
