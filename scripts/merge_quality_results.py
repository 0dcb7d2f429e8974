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
    """Assert every seed's CONSUMER legs share one vq_ckpt_sha256.

    Within one study, every leg that CONSUMES a frozen VQ checkpoint
    (mlp_latent, transformer halves) must consume the seed's pinned
    one, so their recorded hashes must be equal: two DIFFERENT hashes
    among consumers mean the halves were paired against different
    frozen VQ checkpoints — the exact measurement-integrity bug
    round 4 caught by hand. Fail loudly instead of relying on manual
    discipline (ADVICE r4 #1). Rows predating sha recording carry no
    hash and are skipped.

    The vqvae PARITY row's sha is the checkpoint that leg PRODUCED; it
    normally equals the pin, but legitimately differs when a restarted
    study re-trains the parity row while an earlier pin still feeds
    downstream legs (the study prints 'pinned ckpt ... still feeds
    downstream legs'; round 5: a TPU-trained pin + CPU-retrained
    parity row). That case is annotated per-seed, not failed."""
    for seed, comps in merged.items():
        if isinstance(seed, str) and seed.startswith("_"):
            continue
        consumer, producer = {}, {}
        for comp, res in comps.items():
            if not isinstance(res, dict):
                continue
            for side, vals in res.items():
                if isinstance(vals, dict) and "vq_ckpt_sha256" in vals:
                    dest = producer if comp == "vqvae" else consumer
                    dest[f"{comp}/{side}"] = vals["vq_ckpt_sha256"]
        if len(set(consumer.values())) > 1:
            detail = "\n".join(f"  {k}: {v}"
                               for k, v in sorted(consumer.items()))
            raise SystemExit(
                f"seed {seed}: vq_ckpt_sha256 mismatch across consumer "
                f"legs — the halves were paired against different frozen "
                f"VQ checkpoints:\n{detail}")
        if consumer and producer and \
                set(producer.values()) != set(consumer.values()):
            note = ("vqvae parity row retrained after the pin: produced "
                    f"{sorted(set(producer.values()))[0][:12]}, downstream "
                    f"legs consumed {sorted(set(consumer.values()))[0][:12]} "
                    "(pinned; consumer pairing intact)")
            print(f"  seed {seed}: NOTE {note}")
            comps["_vq_sha_note"] = note


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
