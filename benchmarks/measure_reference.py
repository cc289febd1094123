"""Measure the PyTorch reference's inference throughput (the baseline).

The reference publishes no performance numbers (BASELINE.md), so the
baseline is measured here by running its model forward directly:
``GlowTTS.inference`` from ``/root/reference/Modules.py`` in Vanilla mode on
CPU (the BASELINE.json config: "Vanilla single-speaker Glow-TTS …
CPU inference, python MAS fallback").

The GE2E submodule is not vendored in the reference snapshot
(``.gitmodules``), so an import stub is injected; it is never called in
Vanilla mode.  Writes BASELINE_MEASURED.json at the repo root.

Run:  python benchmarks/measure_reference.py
"""

import json
import os
import sys
import tempfile
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference'

BATCH = 32
TOKEN_LEN = 128
LENGTH_SCALE = 8.0   # untrained duration predictor emits ~1 frame/token;
                     # scale to a realistic ~8 frames/token on both sides
WARMUP = 1
ITERS = 3


def main():
    import torch
    import yaml
    torch.set_num_threads(os.cpu_count() or 1)

    # --- import the reference with a Vanilla/CPU config -------------------
    with open(os.path.join(REFERENCE, 'Hyper_Parameters.yaml'),
              encoding='utf-8') as f:
        hp = yaml.safe_load(f)
    hp['Mode'] = 'Vanilla'
    hp['Use_Cython_Alignment'] = False
    hp['Device'] = '-1'

    workdir = tempfile.mkdtemp(prefix='glowtts_baseline_')
    with open(os.path.join(workdir, 'Hyper_Parameters.yaml'), 'w') as f:
        yaml.safe_dump(hp, f)

    # stub the absent Speaker_Embedding submodule (unused in Vanilla mode)
    stub = types.ModuleType('Speaker_Embedding')
    stub_modules = types.ModuleType('Speaker_Embedding.Modules')
    stub_modules.Encoder = object
    stub_modules.Normalize = lambda x: x
    sys.modules['Speaker_Embedding'] = stub
    sys.modules['Speaker_Embedding.Modules'] = stub_modules
    if not hasattr(torch, 'qr'):   # removed in newer torch
        torch.qr = lambda a: tuple(torch.linalg.qr(a))

    os.chdir(workdir)
    sys.path.insert(0, REFERENCE)
    import Modules  # noqa: E402  (the reference model definition)

    model = Modules.GlowTTS().eval()
    # ActNorm flags: inference path never initialises; force like the
    # reference checkpoint-load does (Train.py:527-528)
    for module in model.modules():
        if isinstance(module, Modules.Activation_Norm):
            module.initialized = True

    tokens = torch.randint(0, hp['Encoder']['Embedding_Tokens'],
                           (BATCH, TOKEN_LEN), dtype=torch.long)
    token_lengths = torch.full((BATCH,), TOKEN_LEN, dtype=torch.long)
    length_scales = torch.full((BATCH,), LENGTH_SCALE)

    def run():
        with torch.no_grad():
            mels, mel_lengths, _ = model.inference(
                tokens=tokens, token_lengths=token_lengths,
                mels_for_prosody=None, mel_lengths_for_prosody=None,
                speakers=None, mels_for_ge2e=None,
                pitches=None, pitch_lengths=None,
                length_scale=length_scales)
        return int(mel_lengths.sum())

    for _ in range(WARMUP):
        frames = run()
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        frames = run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    frames_per_sec = frames / best

    sound = hp['Sound']
    audio_sec = frames * sound['Frame_Shift'] / sound['Sample_Rate']
    rtf = best / audio_sec

    result = {
        'framework': 'torch-reference',
        'mode': 'Vanilla',
        'device': 'cpu',
        'threads': torch.get_num_threads(),
        'batch': BATCH,
        'token_length': TOKEN_LEN,
        'length_scale': LENGTH_SCALE,
        'mel_frames': frames,
        'seconds_per_batch': best,
        'mel_frames_per_sec': frames_per_sec,
        'rtf': rtf,
    }
    out_path = os.path.join(REPO, 'BASELINE_MEASURED.json')
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
