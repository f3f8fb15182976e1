#!/usr/bin/env python
"""Entry point — `python train.py task=... train.algo=... key=value ...`
(reference isaacgyminsertion/train.py CLI parity; see isaacgyminsertion_tpu/cli.py)."""

from isaacgyminsertion_tpu.cli import main

if __name__ == "__main__":
    main()
