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
    notes = {}
    for path in paths:
        with open(path) as f:
            data = json.load(f)
        for seed_str, comps in data.items():
            if seed_str.startswith("_"):
                # provenance/annotation keys (e.g. "_provenance") pass
                # through the merge untouched — later files win
                notes[seed_str] = comps
                continue
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
    check_sha_pairing(merged)
    merged.update(notes)
    return merged


def check_sha_pairing(merged):
    """Assert every seed's recorded vq_ckpt_sha256 values agree.

    Within one study, every leg of a seed consumes the checkpoint the
    seed's vqvae jax leg produced, so all recorded hashes must be
    equal. Rows predating sha recording simply carry no hash and are
    skipped — but two DIFFERENT hashes inside one seed mean the halves
    were paired against different frozen VQ checkpoints, the exact
    measurement-integrity bug round 4 caught by hand. Fail loudly
    instead of relying on manual discipline (ADVICE r4 #1)."""
    for seed, comps in merged.items():
        if isinstance(seed, str) and seed.startswith("_"):
            continue
        shas = {}
        for comp, res in comps.items():
            if not isinstance(res, dict):
                continue
            for side, vals in res.items():
                if isinstance(vals, dict) and "vq_ckpt_sha256" in vals:
                    shas[f"{comp}/{side}"] = vals["vq_ckpt_sha256"]
        if len(set(shas.values())) > 1:
            detail = "\n".join(f"  {k}: {v}" for k, v in sorted(shas.items()))
            raise SystemExit(
                f"seed {seed}: vq_ckpt_sha256 mismatch across legs — the "
                f"halves were paired against different frozen VQ "
                f"checkpoints:\n{detail}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--md-out", default=None)
    ap.add_argument("--ref-scale-json", default=None)
    a = ap.parse_args()
    merged = merge(a.inputs)
    seeds = {k: v for k, v in merged.items() if isinstance(k, int)}
    notes = {k: v for k, v in merged.items() if not isinstance(k, int)}
    out = {str(k): v for k, v in sorted(seeds.items())}
    out.update(sorted(notes.items()))
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(f"merged {len(a.inputs)} files -> {a.out}")
    for s, c in sorted(seeds.items()):
        print(f"  seed {s}: {sorted(c)}")
    if a.md_out:
        import quality_study
        ref_scale = None
        if a.ref_scale_json and os.path.exists(a.ref_scale_json):
            with open(a.ref_scale_json) as f:
                ref_scale = json.load(f)
        ok = quality_study.write_quality_md(seeds, a.md_out,
                                            ref_scale=ref_scale)
        print("overall contract:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
