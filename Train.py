"""Training CLI (reference-compatible surface: ``python Train.py -s <step>``).

Adds ``-hp`` for the config path instead of the reference's hard-coded
import-time YAML (``Train.py:22-25`` there).  The flow lives in
``glow_tts_tpu/cli.py`` (also installed as ``glow-tts-train``).
"""

from glow_tts_tpu.cli import train_main as main

if __name__ == '__main__':
    main()
