#!/bin/bash
# Round-5 evidence chain (sequential: 1-CPU host). Ordered TPU-hot
# first; every quality_study leg now carries the CPU-backend fallback
# (recorded per-row as backend: cpu) so a tunnel outage degrades a leg
# instead of aborting the chain — the round-4 failure mode.
#
# EXECUTION RECORD (final session, 2026-08-20/21): a VM wipe killed
# the original detached run before any step landed, and the tunnel
# then flapped all night (~25% duty cycle), so the chain ran as
# ad-hoc splits with the same out-dirs/args:
#   part A  = step 3 then step 2 (CPU-dominated first; step 3 landed
#             rc=0, all 5 seeds sha-paired -> qs_r4_iid_tpu_full.json)
#   step 2  = re-split into torch-half (CPU) + jax-half (TPU-only
#             retry loop, QS_NO_CPU_FALLBACK) after the jax CPU
#             fallback measured ~20 min/epoch under contention; both
#             halves pair on the pinned seed-4 VQ in /root/qs_b_tr_redo
#   part B  = step 0 (landed; r4 iid row reclassified as collapse,
#             results/fullwidth_iid_tripwire_r5.json) then step 1
#             (seeds 5-12 landed of 5-14 before session end)
#   part C  = TPU-only extension seeds 15-20 (all landed)
# Harvest state: QUALITY.md d192 section + Study B tables updated in
# the same session; merged files as named in the instructions below.
#
# Live copy runs detached as /root/qchain_r5.sh (PID in
# /root/qchain_r5.pid, log /root/qchain_r5.log). HARVEST per landed
# step (any later session):
#   step 0 (iid full-width tripwire re-run):
#     results land directly in results/fullwidth_iid_tripwire_r5.json;
#     update QUALITY.md's iid-sweep caveat (constant-good excluded or
#     row reclassified as collapse).
#   step 1 (d192 escape-frequency extension, jax side, seeds 5-14):
#     python scripts/merge_quality_results.py \
#       --out results/qs_r5_markov_tr_ext.json \
#       /root/qs_c_tr_ext/results.json
#     then write the QUALITY.md "d192 class-head escape frequency"
#     section: jax escapes out of 15 total seeds vs torch 5/5
#     (Fisher p), or the mechanism if the gap persists.
#   step 2 (Study B transformer seed 4, both halves):
#     python scripts/merge_quality_results.py \
#       --out results/qs_r4_tr_seed34_redo.json \
#       results/qs_r4_tr_seed34_redo.json /root/qs_b_tr_redo/results.json
#     then resolve the last pairing-unproven row in QUALITY.md's
#     Study B table (seed 4).
#   step 3 (Study B latent+vqvae redo, both sides, seeds 0-4):
#     python scripts/merge_quality_results.py \
#       --out results/qs_r4_iid_tpu_full.json \
#       results/qs_r4_iid_tpu_full.json /root/qs_b_latent_redo/results.json
#     then drop the latent-redo FAILED note from the forensics table.
# The merger asserts per-seed vq_ckpt_sha256 equality across legs
# automatically (tests/test_quality_tools.py).
export PYTHONUNBUFFERED=1
cd /root/repo

echo "=== CHAIN r5 step 0: iid full-width tripwire re-run (3x4g3c6f seed 0) $(date -u +%H:%M:%S) ==="
python scripts/fullwidth_sweep.py --out-dir /root/fw_iid_r5 \
  --cycles 60 --schedules 3x4g3c6f --seeds 0 --regime iid \
  --out results/fullwidth_iid_tripwire_r5.json
echo "=== CHAIN r5 step 0 done rc=$? $(date -u +%H:%M:%S) ==="

echo "=== CHAIN r5 step 1: d192 escape-frequency ext, jax halves seeds 5-14 (markov, 60 cycles) ==="
python scripts/quality_study.py --out-dir /root/qs_c_tr_ext \
  --data-regime markov --cycles 60 --legs transformer --tr-sides jax \
  --seeds 5 6 7 8 9 10 11 12 13 14
echo "=== CHAIN r5 step 1 done rc=$? $(date -u +%H:%M:%S) ==="

echo "=== CHAIN r5 step 2: Study B transformer seed 4 both halves (iid, 200 cycles) ==="
python scripts/quality_study.py --out-dir /root/qs_b_tr_redo \
  --data-regime iid --legs transformer --tr-sides jax torch \
  --seeds 4
echo "=== CHAIN r5 step 2 done rc=$? $(date -u +%H:%M:%S) ==="

echo "=== CHAIN r5 step 3: Study B latent+vqvae redo, both sides, seeds 0-4 (iid, 200 cycles) ==="
python scripts/quality_study.py --out-dir /root/qs_b_latent_redo \
  --data-regime iid --legs vqvae mlp_latent \
  --seeds 0 1 2 3 4
echo "=== CHAIN r5 step 3 done rc=$? $(date -u +%H:%M:%S) ==="
echo "=== CHAIN r5 COMPLETE $(date -u +%H:%M:%S) ==="
