"""End-to-end CLI tests on CPU: the three entry points chained through
checkpoints on disk, like the reference pipeline (SURVEY.md §0)."""
import os

import numpy as np
import pytest

from vq_vae_transformer_arc_welding_tpu.data.synthetic import (
    write_synthetic_csv)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    write_synthetic_csv(str(d / "data" / "processed_asimow_dataset.csv"),
                        n_cycles_per_run=30, extra_train_runs=3)
    cwd = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(cwd)


def test_full_pipeline_via_clis(workdir):
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_classification_model as cls_cli)
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_reconstruction_embedding as rec_cli)
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_transformer_mtasks as tm_cli)

    # stage 1: VQ-VAE reconstruction
    args = rec_cli.build_parser().parse_args([
        "--epochs", "2", "--batch-size", "64", "--num-embeddings", "16",
        "--embedding-dim", "8", "--hidden-dim", "32", "--n-resblocks", "1",
        "--data-dir", "data"])
    result, test_metrics = rec_cli.main(args)
    ckpt = "model_checkpoints/VQ-VAE-Patch/VQ-VAE-Patch-best.ckpt"
    assert os.path.exists(ckpt)
    assert os.path.exists("model_checkpoints/VQ-VAE-Patch/last.ckpt")
    assert np.isfinite(test_metrics["test/loss"])

    # stage 2a: raw MLP classifier
    args = cls_cli.build_parser().parse_args([
        "--model-name", "MLP", "--dataset", "asimow", "--epochs", "2",
        "--batch-size", "32", "--hidden-dim", "32", "--n-hidden-layer", "1",
        "--n-cycles", "2", "--data-dir", "data"])
    result, metrics = cls_cli.main(args)
    assert "test/f1_score_mean" in metrics
    assert os.path.exists("model_checkpoints/MLP-asimow-best.ckpt")

    # stage 2b: latent GRU classifier through the stage-1 checkpoint
    args = cls_cli.build_parser().parse_args([
        "--model-name", "GRU", "--dataset", "latent_vq_vae", "--epochs", "2",
        "--batch-size", "32", "--hidden-dim", "16", "--n-hidden-layer", "1",
        "--n-cycles", "2", "--vqvae-model", ckpt, "--data-dir", "data"])
    result, metrics = cls_cli.main(args)
    assert "test/f1_score_mean" in metrics

    # stage 3: multitask transformer
    args = tm_cli.build_parser().parse_args([
        "--epoch_iter", "2", "--gen-epochs", "1", "--class-epoch", "1",
        "--finetune-epochs", "1", "--batch-size", "16", "--n-cycles", "2",
        "--d-model", "32", "--n-heads", "4", "--n-blocks", "2",
        "--vqvae-model", ckpt, "--data-dir", "data"])
    run, results = tm_cli.main(args)
    assert "class_test" in results and "gen_test" in results
    assert np.isfinite(results["gen_test"]["test/loss"])
    assert "test/cl/f1_score" in results["class_test_final"]


def test_improved_vq_cli_path(workdir):
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_reconstruction_embedding as rec_cli)
    args = rec_cli.build_parser().parse_args([
        "--epochs", "2", "--batch-size", "64", "--num-embeddings", "16",
        "--embedding-dim", "8", "--hidden-dim", "32", "--n-resblocks", "1",
        "--use-improved-vq", "--kmeans-iters", "3", "--data-dir", "data"])
    result, test_metrics = rec_cli.main(args)
    assert np.isfinite(test_metrics["test/loss"])
    # EMA codebook persisted in the checkpoint state
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    m, p, s = VQVAEPatch.load(
        "model_checkpoints/VQ-VAE-Patch/VQ-VAE-Patch-best.ckpt")
    assert m.use_improved_vq and int(s["vq"].initialized) == 1
    assert np.abs(np.asarray(s["vq"].codebook)).sum() > 0


def test_use_all_gpus_data_parallel(workdir):
    """--use-all-gpus trains data-parallel over the 8 virtual devices."""
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_transformer_mtasks as tm_cli)
    ckpt = "model_checkpoints/VQ-VAE-Patch/VQ-VAE-Patch-best.ckpt"
    args = tm_cli.build_parser().parse_args([
        "--epoch_iter", "1", "--gen-epochs", "1", "--finetune-epochs", "1",
        "--batch-size", "16", "--n-cycles", "2", "--d-model", "32",
        "--n-heads", "4", "--n-blocks", "2", "--use-all-gpus",
        "--vqvae-model", ckpt, "--data-dir", "data"])
    run, results = tm_cli.main(args)
    assert np.isfinite(results["gen_test"]["test/loss"])


def test_classification_only_mode(workdir):
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_transformer_mtasks as tm_cli)
    ckpt = "model_checkpoints/VQ-VAE-Patch/VQ-VAE-Patch-best.ckpt"
    args = tm_cli.build_parser().parse_args([
        "--classification-only", "--class-epoch", "1", "--batch-size", "16",
        "--n-cycles", "2", "--d-model", "32", "--n-heads", "4",
        "--n-blocks", "2", "--vqvae-model", ckpt, "--data-dir", "data"])
    run, results = tm_cli.main(args)
    assert "class_test" in results
