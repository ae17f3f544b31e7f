#!/usr/bin/env python
"""Reference-style entry point for fleet evaluation (the reference calls it
``test.py``; named test_models.py here so pytest does not collect it).

``python test_models.py [--filter ...]`` == the test CLI
(see joint_vae_tpu/cli/test.py)."""

import sys

from joint_vae_tpu.cli.test import main

if __name__ == '__main__':
    sys.exit(main())
