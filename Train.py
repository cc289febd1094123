"""Training CLI (reference-compatible surface: ``python Train.py -s <step>``).

Adds ``-hp`` for the config path instead of the reference's hard-coded
import-time YAML (``Train.py:22-25`` there).
"""

import argparse
import logging
import os


def main():
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
        format='%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s')

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


if __name__ == '__main__':
    main()
