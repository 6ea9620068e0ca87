#!/usr/bin/env python
"""Entry point preserving the reference CLI (image_captioner.py).

Usage matches the reference, e.g.:

    python image_captioner.py --training_size 1000 --epochs 2 --batch_size 64
    python image_captioner.py --test_model logs/<ts>/a2cNetwork.ckpt
    python image_captioner.py --curriculum --bidirectional

See ``--help`` for the full flag set (all reference flags plus
TPU-framework additions such as ``--data_dir`` and ``--faithful_beam``).
"""

from image_captioning_through_rl_tpu.cli.main import run

if __name__ == "__main__":
    run()
