#!/usr/bin/env python
"""Reference-style entry point: ``python train.py ...`` == the train CLI
(see joint_vae_tpu/cli/train.py)."""

import sys

from joint_vae_tpu.cli.train import main

if __name__ == '__main__':
    sys.exit(main())
