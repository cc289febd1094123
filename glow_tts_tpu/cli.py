"""Console entry points (``pyproject.toml [project.scripts]``).

The repo-root ``Train.py`` / ``Inference.py`` shims keep the reference's
invocation surface (``python Train.py -s <step>``,
``python Inference.py -c <ckpt>`` — reference ``Train.py:592-598``,
``Inference.py:285-313``); these functions are the same flows hosted
inside the package so an installed wheel exposes ``glow-tts-train`` /
``glow-tts-infer`` / ``glow-tts-patterns`` without the checkout.
"""

import argparse
import logging


def train_main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-hp', '--hyper_parameters',
                        default='configs/Hyper_Parameters.yaml',
                        help='config YAML (reference schema)')
    parser.add_argument('-s', '--initial_step', default=0, type=int,
                        help='resume step; 0 = latest checkpoint')
    parser.add_argument('--profile', default=None,
                        help='profile step window, e.g. 100:110')
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format='%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: '
               '%(message)s')

    from glow_tts_tpu.parallel import mesh as mesh_lib
    # multi-host entry (no-op unless GLOWTTS_MULTIHOST=1): must run before
    # any backend use so every pod process sees the global device set
    mesh_lib.initialize_distributed()

    from glow_tts_tpu.config import load_config
    from glow_tts_tpu.training.trainer import Trainer

    config = load_config(args.hyper_parameters)
    profile = None
    if args.profile:
        start, stop = args.profile.split(':')
        profile = (int(start), int(stop))
    trainer = Trainer(config, initial_step=args.initial_step)
    trainer.train(profile_steps=profile)


def infer_main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--checkpoint', required=True,
                        help='checkpoint directory (with config snapshot)')
    parser.add_argument('-s', '--step', default=0, type=int,
                        help='checkpoint step; 0 = latest')
    parser.add_argument('-f', '--file', default=None,
                        help='TSV inference spec file')
    parser.add_argument('-t', '--text', action='append', default=[],
                        help='inline sentence(s) to synthesise')
    parser.add_argument('-o', '--out_dir', default='./inference_results')
    parser.add_argument('-b', '--batch_size', default=None, type=int)
    parser.add_argument('-wav', '--export_wav', action='store_true',
                        help='also render wavs with the built-in '
                             'Griffin-Lim vocoder')
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from glow_tts_tpu.inference import Inferencer

    inferencer = Inferencer(args.checkpoint, step=args.step,
                            batch_size=args.batch_size)
    if args.file:
        results = inferencer.inference_from_file(
            args.file, args.out_dir, export_wav=args.export_wav)
    elif args.text:
        results = inferencer.inference(
            labels=[f'Sentence_{i}' for i in range(len(args.text))],
            texts=args.text, out_dir=args.out_dir,
            export_wav=args.export_wav)
    else:
        parser.error('give -f <tsv> or -t <text>')
    for r in results:
        print(f"{r['label']}: {r['mel'].shape[0]} frames — {r['text']}")
