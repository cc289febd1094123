"""Worked inference example (equivalent of the reference's
``Inference_Example.ipynb``).

Loads a checkpoint, synthesises a few sentences programmatically, renders
figures / NPYs / Griffin-Lim wavs, and shows the mode-specific inputs.

Run:  python examples/inference_example.py -c ./results/Checkpoint
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--checkpoint', required=True)
    parser.add_argument('-o', '--out_dir', default='./example_out')
    args = parser.parse_args()

    from glow_tts_tpu.inference import Inferencer

    inferencer = Inferencer(args.checkpoint)
    config = inferencer.config
    print(f'Loaded step {inferencer.step}, mode={config.mode}')

    texts = [
        'THE BIRCH CANOE SLID ON THE SMOOTH PLANKS.',
        'GLUE THE SHEET TO THE DARK BLUE BACKGROUND.',
        "IT'S EASY TO TELL THE DEPTH OF A WELL.",
    ]
    labels = [f'Example_{i}' for i in range(len(texts))]
    kwargs = dict(labels=labels, texts=texts,
                  length_scales=[1.0, 1.1, 0.9],
                  out_dir=args.out_dir, export_wav=True)

    if config.uses_speaker_embedding and \
            config.speaker_embedding.type.upper() == 'LUT':
        kwargs['speakers'] = [0] * len(texts)
    if config.uses_speaker_embedding and \
            config.speaker_embedding.type.upper() == 'GE2E':
        kwargs['wavs_for_ge2e'] = ['./Wav_for_Inference/ref.wav'] * len(texts)
    if config.uses_prosody_encoder:
        kwargs['wavs_for_prosody'] = ['./Wav_for_Inference/ref.wav'] * len(texts)
    if config.uses_gradient_reversal:
        kwargs['wavs_for_pitch'] = ['./Wav_for_Inference/ref.wav'] * len(texts)

    results = inferencer.inference(**kwargs)
    for r in results:
        seconds = (r['mel'].shape[0] * config.sound.frame_shift
                   / config.sound.sample_rate)
        print(f"{r['label']}: {r['mel'].shape[0]} frames "
              f"({seconds:.2f}s) — {r['text']}")
    print(f'Artifacts (PNG/NPY/WAV) in {args.out_dir}')


if __name__ == '__main__':
    main()
