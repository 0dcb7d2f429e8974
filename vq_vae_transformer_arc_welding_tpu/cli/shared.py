"""Shared CLI plumbing (parity with reference utils.py:8-42)."""
from __future__ import annotations

import logging as log

from ..data.latent import LatentPredDataModule
from ..data.splits import DataSplitId


def print_training_input_shape(data_module):
    if data_module.train is None:
        data_module.setup("fit")
    sp = data_module.val
    for i, arr in enumerate((sp.x, sp.y, sp.cond)):
        if arr is not None:
            log.info(f"Input {i} shape: {arr.shape} type: {arr.dtype}")


def load_vqvae_any(model_path: str):
    """Load a VQ-VAE checkpoint — ours (msgpack) or a reference
    Lightning .ckpt (torch pickle), sniffed by content."""
    from ..models.vqvae_patch import VQVAEPatch
    try:
        return VQVAEPatch.load(model_path)
    except Exception:
        from ..train.torch_import import load_vqvae_checkpoint
        return load_vqvae_checkpoint(model_path)


def get_metadata_and_artifact_dir(model_name: str):
    """Download a model artifact from wandb and parse its model name
    (parity: reference latentspace_dataloader.py:266-291). Requires the
    wandb package and an active run; raises ImportError otherwise."""
    import os
    try:
        import wandb
    except ImportError as e:
        raise ImportError("wandb is not installed; pass a local checkpoint "
                          "path instead of a wandb artifact link") from e
    artifact_dir = f"./artifacts/{model_name.split('/')[-1]}"
    artifact = wandb.use_artifact(model_name, type="model")
    if not os.path.exists(artifact_dir):
        artifact_dir = artifact.download()
    original = artifact.metadata["original_filename"]
    parts = original.split("-")
    if parts[:3] == ["VQ", "VAE", "Patch"]:
        parsed = "VQ-VAE-Patch"
    elif parts[0] == "VQ":
        parsed = f"{parts[0]}-{parts[1]}"
    else:
        raise ValueError(f"Model name: {model_name} not supported.")
    return parsed, artifact_dir + "/model.ckpt"


def get_latent_dataloader(use_wandb: bool, n_cycles: int, model_path: str,
                          val_ids: list[DataSplitId],
                          test_ids: list[DataSplitId], batch_size: int,
                          task: str,
                          data_directory_path: str | None = None):
    """Build the latent datamodule over a frozen VQ-VAE checkpoint
    (reference utils.py:16-42). Returns (datamodule, config)."""
    if use_wandb:
        model_id = model_path.split("-")[-1]
        _, model_path = get_metadata_and_artifact_dir(model_path)
    else:
        model_id = model_path.split("/")[-1]
    model, params, state = load_vqvae_any(model_path)

    dm = LatentPredDataModule(
        (model, params, state), task=task, n_cycles=n_cycles,
        val_data_ids=val_ids, test_data_ids=test_ids,
        model_name="VQ-VAE-Patch", model_id=model_id, batch_size=batch_size,
        data_directory_path=data_directory_path)
    config = {
        "num_embeddings": model.num_embeddings,
        "patch_size": int(model.patch_size),
        "latent_dim": model.embedding_dim * model.enc_out_len,
    }
    return dm, config


def parse_split_ids(pairs):
    return [DataSplitId(experiment=e, welding_run=w) for e, w in pairs]


def push_summary(logger, logdict: dict):
    """Final summary metrics push (reference
    train_classification_model.py:157-171)."""
    logger.log_metrics(logdict)
    logger.finalize()
