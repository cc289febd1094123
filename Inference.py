"""Inference CLI (reference-compatible surface:
``python Inference.py -c <checkpoint_dir> [-f sentences.tsv] [-o outdir]``).

The flow lives in ``glow_tts_tpu/cli.py`` (also installed as
``glow-tts-infer``).
"""

from glow_tts_tpu.cli import infer_main as main

if __name__ == '__main__':
    main()
