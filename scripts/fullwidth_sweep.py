"""Full-reference-width transformer schedule sweep (JAX/TPU side).

Round-3 found that at the transformer's FULL reference width (d512,
8 blocks, 8 heads, n_cycles 20 -> seq 321, bs 16, accumulate 5 —
reference train_transformer_mtasks.py:213-236 defaults) a shortened
1 x (2 gen + 1 class) + 1 finetune schedule lands the class head in the
constant-predictor attractor on BOTH stacks (QUALITY.md "Full reference
width") — an identical outcome but vacuous for the class head. The full
reference schedule escapes 5/5 JAX seeds but costs ~2,000 CPU-hours for
the torch twin.

This script finds the MINIMAL schedule between those two where the
class head escapes (non-zero test/cl/f1_score) on the JAX side, cheaply
on the TPU, so ONE torch-twin leg can then be paid for at that schedule
(scripts/quality_study.py --legs transformer --tr-sides torch with the
matching schedule/data flags). Matches the reference alternating loop
at /root/reference/train_transformer_mtasks.py:178-197.

Each (data recipe, schedule, seed) leg runs the real CLI in a TPU
subprocess (scripts/cli_leg.py); the seeded reduced-config VQ-VAE leg
(same config as quality_study.py) is trained once per data recipe and
pins its checkpoint in a sentinel so a later torch leg pairs on the
same latent datasets.

Run: python scripts/fullwidth_sweep.py --out-dir /tmp/fw_sweep \
       --cycles 60 --schedules 1x2g2c2f 1x2g3c3f --seeds 0 1 2
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vq_vae_transformer_arc_welding_tpu.data.synthetic import (  # noqa: E402
    write_synthetic_csv)

VQ = dict(hidden=64, k=32, d=8, n_res=2, patch=25, epochs=15, bs=128,
          lr=1e-3, clip=0.7, dropout=0.1)
FW = dict(n_cycles=20, d_model=512, blocks=8, heads=8, bs=16)

SCHED_RE = re.compile(r"^(\d+)x(\d+)g(\d+)c(\d+)f$")


def parse_schedule(s: str):
    m = SCHED_RE.match(s)
    if not m:
        raise ValueError(f"schedule {s!r} not of form <i>x<g>g<c>c<f>f")
    it, g, c, f = map(int, m.groups())
    return dict(epoch_iter=it, gen_epochs=g, class_epochs=c,
                finetune_epochs=f)


_TUNNEL_PROBE_CODE = ("import jax, jax.numpy as jnp; "
                      "x = jnp.ones((128, 128)); "
                      "print(float((x @ x).sum()))")


def _default_backend_answers(probe_timeout_s: int = 90) -> bool:
    """Cheap matmul probe — see quality_study._default_backend_answers.

    The tunneled TPU flaps between healthy and fully-stalled states;
    when stalled, a default-backend attempt burns its full timeout_s
    (2400 s here) before the retry fires. 90 s decides whether the
    default backend is worth attempting at all."""
    try:
        subprocess.run(
            [sys.executable, "-c", _TUNNEL_PROBE_CODE],
            timeout=probe_timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def cli_leg(cli: str, argv: list[str], timeout_s: int = 2400,
            retries: int = 2) -> dict:
    # stream subprocess output to a per-leg log (capture_output hides
    # progress, making a hung TPU leg undiagnosable), and retry with a
    # timeout: the tunneled TPU's backend init intermittently stalls
    # (observed ~0.5% CPU for 20+ min; a fresh process succeeds).
    # Round 5: a final CPU-backend attempt (backend recorded in the
    # result row, as in quality_study._jax_leg) replaces the bare
    # raise — a tunnel OUTAGE degrades the leg instead of killing the
    # sweep — and a 90 s pre-probe skips the default-backend attempts
    # entirely when the tunnel is stalled right now.
    attempts = [None] * (retries + 1)
    if not _default_backend_answers():
        print("  leg: default-backend probe stalled — skipping straight "
              "to the cpu fallback", flush=True)
        attempts = []
    attempts.append("cpu")
    for attempt, platform in enumerate(attempts):
        env = None
        t_s = timeout_s
        if platform is not None:
            # CLILEG_FORCE_PLATFORM, not JAX_PLATFORMS: the baked
            # sitecustomize's TPU registration overrides the env var
            env = dict(os.environ, JAX_PLATFORMS=platform,
                       CLILEG_FORCE_PLATFORM=platform)
            t_s = max(timeout_s * 6, 7200)
            if attempt:
                print(f"  leg: default backend exhausted {attempt} "
                      f"attempts — falling back to {platform} "
                      f"(recorded in the result row)", flush=True)
        logp = os.path.join(os.getcwd(),
                            f"leg_{cli}_{int(time.time())}.log")
        try:
            with open(logp, "w") as lf:
                proc = subprocess.run(
                    [sys.executable,
                     os.path.join(REPO, "scripts", "cli_leg.py"),
                     "--cli", cli, "--argv-json", json.dumps(argv)],
                    stdout=lf, stderr=subprocess.STDOUT, text=True,
                    cwd=os.getcwd(), timeout=t_s, env=env)
        except subprocess.TimeoutExpired:
            print(f"  leg timed out after {t_s}s "
                  f"(attempt {attempt + 1}/{len(attempts)}, log: {logp})",
                  flush=True)
            continue
        with open(logp) as lf:
            stdout = lf.read()
        line = [ln for ln in stdout.splitlines()
                if ln.startswith("CLILEG_RESULT ")]
        if proc.returncode == 3:
            # cli_leg's backend watchdog: init stalled — retry fresh
            print(f"  leg backend-init stall (attempt {attempt + 1}/"
                  f"{len(attempts)}, log: {logp})", flush=True)
            continue
        if proc.returncode != 0 or not line:
            sys.stderr.write(stdout[-4000:])
            raise RuntimeError(f"cli_leg {cli} failed (log: {logp})")
        out = json.loads(line[-1][len("CLILEG_RESULT "):])
        backend = out.pop("backend")
        print(f"  backend: {backend} (log: {logp})", flush=True)
        if platform is not None:
            out["backend"] = backend  # flag the fallback in result rows
        return out
    raise RuntimeError(f"cli_leg {cli} timed out {retries + 1} times")


def ensure_vq(out_dir: str, data_dir: str, seed: int = 0) -> str:
    """Train (or reuse) the seeded reduced-config VQ leg; pin sentinel.

    Pins an immutable per-seed COPY, not the CLI's reused
    best-checkpoint path (whose bytes any later VQ leg in the same
    out_dir would overwrite — the round-4 quality_study pairing bug;
    this sweep trains a single VQ per out_dir so it was safe in
    practice, hardened for the same reason)."""
    sentinel = os.path.join(out_dir, f"vq_ckpt_seed{seed}.txt")
    pinned = os.path.join(out_dir, f"vq_best_seed{seed}.ckpt")
    if os.path.exists(sentinel):
        cand = open(sentinel).read().strip()
        if cand == pinned and os.path.exists(cand):
            print(f"reusing pinned VQ ckpt {cand}", flush=True)
            return cand
        if os.path.exists(cand):
            print(f"IGNORING legacy sentinel {cand} (mutable path) — "
                  "retraining VQ", flush=True)
    print("=== VQ-VAE leg ===", flush=True)
    leg = cli_leg("recon", [
        "--epochs", str(VQ["epochs"]), "--batch-size", str(VQ["bs"]),
        "--num-embeddings", str(VQ["k"]), "--embedding-dim", str(VQ["d"]),
        "--hidden-dim", str(VQ["hidden"]), "--n-resblocks", str(VQ["n_res"]),
        "--patch-size", str(VQ["patch"]), "--dropout-p", str(VQ["dropout"]),
        "--learning-rate", str(VQ["lr"]), "--clipping-value", str(VQ["clip"]),
        "--data-dir", data_dir, "--seed", str(seed)])
    shutil.copyfile(leg["best_ckpt_path"], pinned)
    with open(sentinel, "w") as f:
        f.write(pinned)
    return pinned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/fw_sweep")
    ap.add_argument("--cycles", type=int, default=100,
                    help="synthetic cycles per run (torch-leg cost knob)")
    ap.add_argument("--extra-train-runs", type=int, default=10)
    ap.add_argument("--schedules", nargs="+",
                    default=["1x2g2c2f", "1x2g3c3f", "1x4g2c2f"],
                    help="e.g. 1x2g2c2f = epoch_iter 1, 2 gen epochs, "
                         "2 class epochs, 2 finetune epochs")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--regime", choices=["iid", "markov"], default="iid",
                    help="'markov' = the Study-C learnable regime "
                         "(bursty defects, signature_strength 0.5) — "
                         "on iid data the class task's Bayes error is "
                         "~25%% so 'escape' can only mean leaving the "
                         "constant predictor, not learning; on markov "
                         "a genuinely learned head is measurable "
                         "(acc_good AND acc_bad > 0)")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    out_dir = os.path.abspath(a.out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # absolute: written from inside the os.chdir(out_dir) block below —
    # a relative --out crashed the round-5 tripwire run AFTER its leg
    # succeeded (result recovered from the leg log)
    out_json = os.path.abspath(a.out or os.path.join(out_dir, "sweep.json"))
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    csv = os.path.join(data_dir, "processed_asimow_dataset.csv")
    if not os.path.exists(csv):
        extra = ({"label_process": "markov", "signature_strength": 0.5}
                 if a.regime == "markov" else {})
        write_synthetic_csv(csv, n_cycles_per_run=a.cycles,
                            extra_train_runs=a.extra_train_runs, seed=0,
                            **extra)

    results = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)
    cwd = os.getcwd()
    os.chdir(out_dir)
    try:
        vq_ckpt = ensure_vq(out_dir, data_dir)
        for sched in a.schedules:
            sc = parse_schedule(sched)
            for seed in a.seeds:
                key = f"{sched}/seed{seed}"
                if key in results:
                    print(f"skip {key} (done)", flush=True)
                    continue
                t0 = time.time()
                print(f"=== {key} ===", flush=True)
                leg = cli_leg("transformer", [
                    "--epoch_iter", str(sc["epoch_iter"]),
                    "--batch-size", str(FW["bs"]),
                    "--n-cycles", str(FW["n_cycles"]),
                    "--d-model", str(FW["d_model"]),
                    "--n-heads", str(FW["heads"]),
                    "--n-blocks", str(FW["blocks"]),
                    "--gen-epochs", str(sc["gen_epochs"]),
                    "--class-epoch", str(sc["class_epochs"]),
                    "--finetune-epochs", str(sc["finetune_epochs"]),
                    "--vqvae-model", vq_ckpt,
                    "--data-dir", data_dir, "--seed", str(seed)])
                leg["wall_s"] = round(time.time() - t0, 1)
                leg["cycles_per_run"] = a.cycles
                results[key] = leg
                with open(out_json, "w") as f:
                    json.dump(results, f, indent=2)
                tripwire = ""
                if "test/cl/acc_good" in leg:
                    tripwire = (f" acc_good={leg['test/cl/acc_good']:.3f}"
                                f" acc_bad={leg['test/cl/acc_bad']:.3f}")
                print(f"  {key}: f1={leg['test/cl/f1_score']:.4f} "
                      f"gen={leg['gen/loss']:.4f}{tripwire} "
                      f"[{leg['wall_s']}s]", flush=True)
    finally:
        os.chdir(cwd)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
