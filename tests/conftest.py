"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The reference has no tests (SURVEY.md §4); we simulate multi-chip with
virtual CPU devices — the TPU-native analog of a fake backend. The
environment's sitecustomize imports jax (for the TPU tunnel) before
conftest runs, so env vars are too late; jax.config still works because
no backend has been initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# Tests measured >=~8s on the 1-CPU CI host (full-suite --durations run,
# 2026-08-17): marked `slow` centrally so the fast lane
# `pytest -m "not slow"` stays ~<5 min. Interpret-mode Pallas kernels and
# multi-epoch trainings dominate. Keep this list in sync when adding
# heavyweight tests.
_SLOW = {
    "test_bench_multichip_harness",
    "test_quantized_matches_f32_labels",
    "test_full_pipeline_via_clis",
    "test_pipeline_mesh_data_parallel",
    "test_quantized_kv_sampler_consistency",
    "test_transformer_with_pallas_attention_matches_xla",
    "test_fused_attn_quant_matches_xla_int8",
    "test_dryrun_multichip_like_driver",
    "test_ts2vec_fit_and_encode",
    "test_use_all_gpus_data_parallel",
    "test_tensor_parallel_cli",
    "test_dryrun_multichip_odd_device_count",
    "test_generate_kv_long_prompt_and_cropping",
    "test_vq_ema_shard_map_codebooks_identical",
    "test_pipeline_int8_precision",
    "test_vqvae_training_trajectory_matches_torch",
    "test_int8_calibration_distribution_shift",
    "test_ts2vec_eval_classification",
    "test_flash_attention_grads_match_xla",
    "test_transformer_radam_trajectory_matches_torch",
    "test_transformer_trajectory_reference_scale",
    "test_hierarchical_loss_matches_torch",
    "test_transformer_gen_trajectory_matches_torch",
    "test_weight_decay_skips_out_of_graph_params",
    "test_classification_ids_pipeline_trains",
    "test_quantized_calibrated_matches_dynamic",
    "test_orbax_preserves_tp_sharding",
    "test_int8_encoder_opt_in",
    "test_gru_training_trajectory_matches_torch",
    "test_lightning_ckpt_import",
    "test_bf16_serving_mode_label_parity",
    "test_transformer_export_roundtrip",
    "test_classification_only_mode",
    "test_orbax_roundtrip",
    "test_ts_encoder_matches_torch_twin",
    "test_generate_kv_matches_generate",
    "test_quantization_is_symmetric_int8",
    "test_pipeline_sampling",
    "test_artifact_roundtrip_f32",
    "test_artifact_roundtrip_int8_no_recalibration",
    "test_score_quality_cli",
    # NOT slow-marked: test_latent_module_depends_on_vq_params (~6 s) is
    # the regression guard for content-keyed latent caching and must run
    # in the fast lane (ADVICE r4 #3)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.originalname in _SLOW or item.name in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
