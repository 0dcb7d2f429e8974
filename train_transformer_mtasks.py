#!/usr/bin/env python
"""Root shim: multitask latent transformer training (reference-compatible CLI).

See vq_vae_transformer_arc_welding_tpu/cli/train_transformer_mtasks.py.
"""
import logging as log

from vq_vae_transformer_arc_welding_tpu.cli.train_transformer_mtasks import (
    build_parser, main)

if __name__ == "__main__":
    FORMAT = "%(asctime)s - %(levelname)s - %(message)s"
    log.basicConfig(level=log.INFO, format=FORMAT)
    main(build_parser().parse_args())
