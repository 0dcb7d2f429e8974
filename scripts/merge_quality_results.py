"""Merge quality-study results JSONs (per-seed, per-leg) into one.

The study supports selective legs (`quality_study.py --legs ...`), so a
full Study B accumulates across runs/rounds: e.g. seeds 0-1 all legs
(round 2), seeds 2-4 classifier legs + seeds 1-2 transformer legs
(round 3). This merges any number of results/partial files — later
files win on a per-(seed, component) basis — and optionally rebuilds
the generated markdown via quality_study.write_quality_md.

Usage:
  python scripts/merge_quality_results.py --out merged.json \
      results/quality_study_refhparams_partial.json \
      results/quality_study_refhparams_seed1_legs.json \
      /tmp/qs_r3_cls/results_partial.json [--md-out PATH]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "scripts")]


def merge(paths):
    merged = {}
    for path in paths:
        with open(path) as f:
            data = json.load(f)
        for seed_str, comps in data.items():
            seed = int(seed_str)
            merged.setdefault(seed, {})
            for comp, res in comps.items():
                prev = merged[seed].get(comp)
                if (isinstance(prev, dict) and isinstance(res, dict)
                        and set(res) <= {"jax", "torch"}):
                    # side-aware merge: a --tr-sides split run carries
                    # one stack's leg with the other side empty — fill
                    # sides, never clobber a populated one with {}
                    for side, vals in res.items():
                        if vals:
                            prev[side] = vals
                else:
                    merged[seed][comp] = res
    return merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--md-out", default=None)
    ap.add_argument("--ref-scale-json", default=None)
    a = ap.parse_args()
    merged = merge(a.inputs)
    with open(a.out, "w") as f:
        json.dump({str(k): v for k, v in sorted(merged.items())}, f,
                  indent=2, default=float)
    counts = {s: sorted(c) for s, c in sorted(merged.items())}
    print(f"merged {len(a.inputs)} files -> {a.out}")
    for s, c in counts.items():
        print(f"  seed {s}: {c}")
    if a.md_out:
        import quality_study
        ref_scale = None
        if a.ref_scale_json and os.path.exists(a.ref_scale_json):
            with open(a.ref_scale_json) as f:
                ref_scale = json.load(f)
        ok = quality_study.write_quality_md(merged, a.md_out,
                                            ref_scale=ref_scale)
        print("overall contract:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
