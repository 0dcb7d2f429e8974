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


def test_tensor_parallel_cli(workdir):
    """--tensor-parallel 2 --use-all-gpus trains dp x tp on a
    (4, 2) virtual mesh (Megatron param sharding via
    parallel/sharding.py rules) and produces finite losses."""
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_transformer_mtasks as tm_cli)
    ckpt = "model_checkpoints/VQ-VAE-Patch/VQ-VAE-Patch-best.ckpt"
    args = tm_cli.build_parser().parse_args([
        "--epoch_iter", "1", "--gen-epochs", "1", "--finetune-epochs", "1",
        "--batch-size", "16", "--n-cycles", "2", "--d-model", "32",
        "--n-heads", "4", "--n-blocks", "2", "--use-all-gpus",
        "--tensor-parallel", "2", "--vqvae-model", ckpt, "--data-dir",
        "data"])
    run, results = tm_cli.main(args)
    assert np.isfinite(results["gen_test"]["test/loss"])
    assert np.isfinite(results["class_test"]["test/cl/f1_score"])


def test_tensor_parallel_excludes_pipeline(workdir):
    from vq_vae_transformer_arc_welding_tpu.cli import (
        train_transformer_mtasks as tm_cli)
    with pytest.raises(NotImplementedError):
        tm_cli._maybe_mesh(True, pipeline_stages=2, tensor_parallel=2)


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


def test_score_quality_cli(tmp_path):
    """score_quality: artifact + raw CSV -> per-window scores, windows
    built per run (no boundary spanning), scaler applied from the
    artifact."""
    import numpy as np

    from vq_vae_transformer_arc_welding_tpu.cli import score_quality
    from vq_vae_transformer_arc_welding_tpu.data.asimow import (
        load_asimow_csv)
    from vq_vae_transformer_arc_welding_tpu.data.scaler import StandardScaler
    from vq_vae_transformer_arc_welding_tpu.models import (
        TransformerDecoder, VQVAEPatch)
    from vq_vae_transformer_arc_welding_tpu.serve import (
        WeldingQualityPipeline)

    csv = str(tmp_path / "prod.csv")
    write_synthetic_csv(csv, n_cycles_per_run=8, extra_train_runs=0,
                        seed=3)
    vi, _, _, run = load_asimow_csv(csv)

    n_cycles = 2
    vq = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                    embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                    batch_norm=False)
    vq_params, vq_state = vq.init(0)
    tr = TransformerDecoder(d_model=16, n_classes=10,
                            seq_len=n_cycles * vq.enc_out_len + 1,
                            n_blocks=1, n_head=2)
    tr_params, _ = tr.init(0)
    pipe = WeldingQualityPipeline((vq, vq_params, vq_state),
                                  (tr, tr_params), n_cycles=n_cycles,
                                  max_batch=8)
    pipe.scaler = StandardScaler().fit(vi)
    art = str(tmp_path / "artifact")
    pipe.save_artifact(art)

    out = str(tmp_path / "scores.csv")
    args = score_quality.build_parser().parse_args(
        ["--artifact", art, "--data-path", csv, "--out", out])
    assert score_quality.main(args) == out

    lines = open(out).read().strip().split("\n")
    assert lines[0] == \
        "experiment,welding_run,start_cycle,label,p_bad,p_good"
    # runs are 8 cycles; welding_run ids repeat ACROSS experiments, so
    # grouping must be by the (experiment, welding_run) pair — each of
    # the n_groups runs yields range(0, 8-2+1, 2) = 4 windows
    exp_arr = load_asimow_csv(csv)[2]
    n_groups = np.unique(np.stack([exp_arr, run], axis=1), axis=0).shape[0]
    assert n_groups > np.unique(run).shape[0]  # collisions really occur
    assert len(lines) - 1 == 4 * n_groups
    rows = [ln.split(",") for ln in lines[1:]]
    for r in rows:
        assert r[3] in ("0", "1")
        assert abs(float(r[4]) + float(r[5]) - 1.0) < 1e-4
    # stride=1: 7 windows per run
    args = score_quality.build_parser().parse_args(
        ["--artifact", art, "--data-path", csv, "--out", out,
         "--stride", "1"])
    score_quality.main(args)
    ref_rows = open(out).read()
    assert len(ref_rows.strip().split("\n")) - 1 == 7 * n_groups
    # tiny --chunk forces multiple flushes; output must be identical
    out2 = str(tmp_path / "scores_chunked.csv")
    args = score_quality.build_parser().parse_args(
        ["--artifact", art, "--data-path", csv, "--out", out2,
         "--stride", "1", "--chunk", "3"])
    score_quality.main(args)
    assert open(out2).read() == ref_rows
