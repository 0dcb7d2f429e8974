"""Long reference-scale trajectory parity with a recorded drift curve.

Runs tests/test_grad_parity._reference_scale_trajectory (d512/8 blocks/
seq 321, RAdam + decay split + clip + accumulate-5) for --opt-steps
optimizer steps and dumps the per-micro-step (torch_loss, jax_loss)
trace to JSON, so the divergence BOUND for
test_transformer_trajectory_reference_scale_long can be set from
measured accumulation behavior instead of guessed (the first 50-step
run tripped a guessed 2e-3 bound with no trace to diagnose).

Usage: python scripts/ref_scale_parity.py --opt-steps 50 \
           --out results/ref_scale_parity_50step.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tests")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt-steps", type=int, default=50)
    ap.add_argument("--out", default="/tmp/ref_scale_parity.json")
    ap.add_argument("--control", type=float, default=0.0,
                    help="run the TORCH side only, with one weight "
                         "perturbed by this relative epsilon — the "
                         "chaos-amplification control arm. Its drift is "
                         "computed against the unperturbed torch trace "
                         "of a prior dual run (--baseline): cross-stack "
                         "differences are benign iff they amplify like "
                         "a ~1-ulp perturbation does")
    ap.add_argument("--baseline", default=None,
                    help="control mode: JSON artifact of the dual run "
                         "at the SAME --opt-steps, whose torch_losses "
                         "is the unperturbed trace to diff against")
    ap.add_argument("--schedule", nargs="+", choices=["gen", "class"],
                    default=None,
                    help="multi-switch task schedule (e.g. class gen "
                         "class), --opt-steps optimizer steps per "
                         "segment — the reference alternates 7 times "
                         "(train_transformer_mtasks.py:178-197); "
                         "default: gen prefix then class (one switch)")
    a = ap.parse_args()

    import test_grad_parity as tg
    rng = np.random.default_rng(0)
    trace: list = []
    if a.schedule:
        # multi-switch schedule: a.opt_steps optimizer steps PER segment
        segments = [(s, 5 * a.opt_steps) for s in a.schedule]
        micro = sum(n for _, n in segments)
        n_opt_total = len(a.schedule) * a.opt_steps
        max_d = tg._reference_scale_trajectory(
            rng, micro_steps=0, bs=4, accum=5, schedule=segments,
            trace=trace, run_jax=not a.control, torch_perturb=a.control)
    else:
        micro = 5 * a.opt_steps
        n_opt_total = a.opt_steps
        max_d = tg._reference_scale_trajectory(
            rng, micro_steps=micro, bs=4, accum=5, gen_prefix=micro // 2,
            trace=trace, run_jax=not a.control, torch_perturb=a.control)
    lt = np.array([t for t, _ in trace])
    if a.control:
        # the jax column was never run (all-NaN); the control arm's
        # comparison target is the stored unperturbed torch trace
        if not a.baseline:
            ap.error("--control requires --baseline (dual-run artifact "
                     "providing the unperturbed torch_losses trace)")
        with open(a.baseline) as f:
            base = json.load(f)
        ref = np.array(base.get("torch_losses", []))
        if ref.shape != lt.shape:
            raise SystemExit(
                f"--baseline torch_losses length {ref.shape} does not "
                f"match this run's {lt.shape}; re-run the dual run at "
                f"--opt-steps {a.opt_steps} first")
    else:
        ref = np.array([j for _, j in trace])
    d = np.abs(lt - ref)
    rel = d / np.maximum(np.abs(lt), 1e-9)
    out = {
        "opt_steps": n_opt_total, "micro_steps": micro,
        "schedule": a.schedule,
        "max_abs_drift": float(d.max()),
        "max_rel_drift": float(rel.max()),
        "final_losses": {"torch": float(lt[-1]),
                         ("torch_unperturbed" if a.control else "jax"):
                             float(ref[-1])},
        "control_perturb": a.control,
        "drift_by_opt_step": [float(d[i * 5:(i + 1) * 5].max())
                              for i in range(n_opt_total)],
        "torch_losses": lt.round(7).tolist(),
    }
    if not a.control:
        out["jax_losses_every5"] = ref[::5].round(6).tolist()
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("max_abs_drift", "max_rel_drift", "final_losses")}))
    print(f"wrote {a.out}")
    assert a.control or max_d == float(d.max())


if __name__ == "__main__":
    main()
