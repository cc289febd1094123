"""Inference CLI (reference-compatible surface:
``python Inference.py -c <checkpoint_dir> [-f sentences.tsv] [-o outdir]``).
"""

import argparse
import logging


def main():
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


if __name__ == '__main__':
    main()
