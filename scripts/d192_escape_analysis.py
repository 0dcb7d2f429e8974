"""d192 class-head escape-frequency analysis (VERDICT r4 #2).

Study C's transformer rows at d192/4 blocks (full reference schedule,
markov regime) showed torch escaping the constant-predictor attractor
5/5 seeds vs jax 2/5 (Fisher one-sided p = 0.083). Round 5 extends the
jax side by up to 10 seeds (chain step 1, `--seeds 5..14`) to turn the
anecdote into a frequency estimate.

Escape definition (the per-class-accuracy tripwire): a leg is an
ESCAPE iff min(acc_good, acc_bad) > 0.05 — both classes actually
predicted; constant-good (1.00/0.00) and constant-bad (0.00/1.00)
collapses are non-escapes regardless of their F1 (the constant-good F1
on these splits is ~0.83, ABOVE many learned rows — F1 alone cannot
tell, QUALITY.md Study C).

Usage:
  python scripts/d192_escape_analysis.py \
      results/qs_r4_markov_tr.json results/qs_r5_markov_tr_ext.json
"""
from __future__ import annotations

import json
import sys
from math import comb


def fisher_one_sided(k1, n1, k2, n2):
    """P(X >= k1) under H0 same rate, conditioning on k1+k2 successes
    (hypergeometric tail — torch escapes k1/n1 vs jax k2/n2)."""
    k, n = k1 + k2, n1 + n2
    denom = comb(n, k)
    p = 0.0
    for x in range(k1, min(n1, k) + 1):
        if k - x <= n2:
            p += comb(n1, x) * comb(n2, k - x) / denom
    return p


def classify(leg):
    ag = leg.get("test/cl/acc_good")
    ab = leg.get("test/cl/acc_bad")
    if ag is None or ab is None:
        return "no-tripwire"
    if min(ag, ab) > 0.05:
        return "escape"
    return "constant-good" if ag > ab else "constant-bad"


def main():
    rows = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            data = json.load(f)
        for seed_str, comps in data.items():
            if seed_str.startswith("_") or "transformer" not in comps:
                continue
            for side, leg in comps["transformer"].items():
                if isinstance(leg, dict) and leg:
                    rows[(int(seed_str), side)] = leg

    counts = {"jax": [0, 0], "torch": [0, 0]}  # [escapes, total]
    print(f"{'seed':>4} {'side':>6} {'f1':>7} {'acc_g':>6} {'acc_b':>6} "
          f"{'backend':>8}  verdict")
    for (seed, side), leg in sorted(rows.items()):
        verdict = classify(leg)
        if verdict != "no-tripwire":
            counts[side][1] += 1
            counts[side][0] += verdict == "escape"
        default_backend = "tpu" if side == "jax" else "cpu"
        print(f"{seed:>4} {side:>6} {leg.get('test/cl/f1_score', -1):>7.4f} "
              f"{leg.get('test/cl/acc_good', -1):>6.2f} "
              f"{leg.get('test/cl/acc_bad', -1):>6.2f} "
              f"{leg.get('backend', default_backend):>8}  {verdict}")

    (kj, nj), (kt, nt) = counts["jax"], counts["torch"]
    print(f"\nescape frequency: torch {kt}/{nt}, jax {kj}/{nj}")
    if nj and nt:
        p = fisher_one_sided(kt, nt, kj, nj)
        print(f"Fisher exact one-sided (torch rate > jax rate): p = {p:.4f}")


if __name__ == "__main__":
    main()
