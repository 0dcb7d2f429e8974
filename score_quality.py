#!/usr/bin/env python
"""Root shim: batch quality scoring from a serving artifact.

See vq_vae_transformer_arc_welding_tpu/cli/score_quality.py.
"""
import logging as log

from vq_vae_transformer_arc_welding_tpu.cli.score_quality import (
    build_parser, main)

if __name__ == "__main__":
    FORMAT = "%(asctime)s - %(levelname)s - %(message)s"
    log.basicConfig(level=log.INFO, format=FORMAT)
    main(build_parser().parse_args())
