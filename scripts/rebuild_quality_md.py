"""Regenerate QUALITY.md from a completed study's results.json.

Lets the report be rebuilt (e.g. to merge scripts/quality_ref_scale.py
results that finished after the study) without re-running any
training.

Usage: python scripts/rebuild_quality_md.py --results /tmp/qs_r2/results.json
           [--ref-scale-json PATH] [--md-out QUALITY.md]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "scripts"),
                os.path.join(REPO, "tests")]

import quality_study  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--ref-scale-json", default=None)
    # QUALITY.md is a hand-merged two-study report; default to a
    # sibling of the results file so a rebuild never clobbers it
    ap.add_argument("--md-out", default=None,
                    help="output path (default: <results dir>/"
                         "QUALITY_generated.md)")
    a = ap.parse_args()
    if a.md_out is None:
        a.md_out = os.path.join(
            os.path.dirname(os.path.abspath(a.results)),
            "QUALITY_generated.md")
    with open(a.results) as f:
        results = {int(k): v for k, v in json.load(f).items()}
    ref_scale = None
    if a.ref_scale_json and os.path.exists(a.ref_scale_json):
        with open(a.ref_scale_json) as f:
            ref_scale = json.load(f)
    ok = quality_study.write_quality_md(results, a.md_out,
                                        ref_scale=ref_scale)
    print("overall contract:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
