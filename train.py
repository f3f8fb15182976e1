#!/usr/bin/env python
"""Entry point — `python train.py task=... train.algo=... key=value ...`
(reference isaacgyminsertion/train.py CLI parity; see isaacgyminsertion_tpu/cli.py)."""

import os

if os.environ.get("IGT_PLATFORM"):
    # the environment's sitecustomize pins the axon TPU platform at
    # interpreter start, so JAX_PLATFORMS is too late — override via
    # jax.config before any backend is initialized (same trick as
    # tests/conftest.py). IGT_PLATFORM=cpu runs training on the host.
    import jax

    jax.config.update("jax_platforms", os.environ["IGT_PLATFORM"])

from isaacgyminsertion_tpu.cli import main

if __name__ == "__main__":
    main()
