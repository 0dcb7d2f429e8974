#!/bin/bash
# Round-4 re-run chain (sequential: 1-CPU host). Each step merge-writes
# into its out-dir's results.json; harvest + merge into repo results/
# as steps land. Survives session respawns.
#
# Live copy runs detached as /root/qchain_r4.sh (PID in
# /root/qchain_r4.pid, log /root/qchain_r4.log). HARVEST per landed
# step (any later session, incl. round 5):
#   step 1+4 (Study C transformer):
#     python scripts/merge_quality_results.py \
#       --out results/qs_r4_markov_tr.json \
#       results/qs_r4_markov_tr.json /root/qs_c_tr_redo/results.json
#   step 2 (Study C cls torch latent halves):
#     merge /root/qs_c_cls_redo/results.json into results/qs_r4_markov_cls_torch.json
#   step 3 (Study B latent+vqvae, both sides):
#     merge /root/qs_b_latent_redo/results.json into results/qs_r4_iid_tpu_full.json
#   step 5 (Study B transformer seeds 3-4):
#     merge /root/qs_b_tr_redo/results.json into results/qs_r3_tr_seed34.json
#       (or keep as its own results/qs_r4_tr_seed34_redo.json)
# then update the matching QUALITY.md tables/caveats (grep "in flight").
# Every re-run leg carries vq_ckpt_sha256 — assert jax/torch halves of a
# seed share the sha before calling the pair valid.
export PYTHONUNBUFFERED=1
cd /root/repo

echo "=== CHAIN step 1: Study C transformer torch halves seeds 0,1 (markov, 60 cycles) $(date -u +%H:%M:%S) ==="
python scripts/quality_study.py --out-dir /root/qs_c_tr_redo \
  --data-regime markov --cycles 60 --legs transformer --tr-sides torch \
  --seeds 0 1
echo "=== CHAIN step 1 done rc=$? $(date -u +%H:%M:%S) ==="

echo "=== CHAIN step 2: Study C cls torch mlp_latent halves seeds 0-3 (markov, 200 cycles) ==="
python scripts/quality_study.py --out-dir /root/qs_c_cls_redo \
  --data-regime markov --legs mlp_latent --cls-sides torch \
  --seeds 0 1 2 3
echo "=== CHAIN step 2 done rc=$? $(date -u +%H:%M:%S) ==="

echo "=== CHAIN step 3: Study B latent+vqvae redo, both sides, seeds 0-4 (iid, 200 cycles) ==="
python scripts/quality_study.py --out-dir /root/qs_b_latent_redo \
  --data-regime iid --legs vqvae mlp_latent \
  --seeds 0 1 2 3 4
echo "=== CHAIN step 3 done rc=$? $(date -u +%H:%M:%S) ==="

echo "=== CHAIN step 4: Study C transformer extension seeds 3,4 both halves (markov, 60 cycles) ==="
python scripts/quality_study.py --out-dir /root/qs_c_tr_redo \
  --data-regime markov --cycles 60 --legs transformer --tr-sides jax torch \
  --seeds 3 4
echo "=== CHAIN step 4 done rc=$? $(date -u +%H:%M:%S) ==="

echo "=== CHAIN step 5: Study B transformer seeds 3,4 both halves (iid, 200 cycles) ==="
python scripts/quality_study.py --out-dir /root/qs_b_tr_redo \
  --data-regime iid --legs transformer --tr-sides jax torch \
  --seeds 3 4
echo "=== CHAIN step 5 done rc=$? $(date -u +%H:%M:%S) ==="
echo "=== CHAIN COMPLETE $(date -u +%H:%M:%S) ==="
