"""Multitask latent-transformer CLI (generation + classification).

Drop-in surface parity with reference train_transformer_mtasks.py
(flags :211-238, flow :99-207): same flags/defaults, the alternating
task schedule (per iteration: 10 generation epochs, then 2
classification epochs; last iteration runs the finetune stage), fresh
trainer per stage with accumulate_grad_batches=5 and clip 0.8, final
test of both tasks. `--use-all-gpus` maps to data-parallel sharding
over all available TPU devices (the reference's DDP, SURVEY.md §5).
"""
from __future__ import annotations

import argparse
import logging as log

from ..data.splits import get_val_test_ids
from ..log.select import select_logger
from ..models.transformer import TransformerDecoder
from ..train.loop import Trainer
from ..train.optim import make_transformer_optimizer
from ..train.tasks import TransformerClassTask, TransformerGenTask
from .shared import (get_latent_dataloader, parse_split_ids,
                     print_training_input_shape)


def build_parser():
    parser = argparse.ArgumentParser(description="Train-Latent-Transformer")
    a = parser.add_argument
    a("--epoch_iter", type=int, default=3,
      help="Number of epochs iterations (15 epochs autoregressive train, "
           "2 epochs classification")
    a("--batch-size", type=int, help="Batch size", default=16)
    a("--n-cycles", type=int, help="Number of cycles", default=20)
    a("--d-model", type=int, help="Number of embeddings", default=512)
    a("--n-heads", type=int, help="Number of heads", default=8)
    a("--n-blocks", type=int, help="Number of transformer blocks", default=6)
    a("--use-class-head-bias", action=argparse.BooleanOptionalAction)
    a("--use-class-head-dropout", action=argparse.BooleanOptionalAction)
    a("--use-wandb", action=argparse.BooleanOptionalAction,
      help="Use Weights and Bias for Logging & loading the model from wandb")
    a("--use-wandb-for-logging", action=argparse.BooleanOptionalAction,
      help="Use Weights and Bias for Logging")
    a("--use-mlflow", action=argparse.BooleanOptionalAction,
      help="Use MLflow for Logging")
    a("--mlflow-url", type=str, help="URL of the MLflow server",
      default="http://mlflow.tmdt.uni-wuppertal.de/")
    a("--logging-entity", type=str, help="Weights and Bias or MLflow entity")
    a("--logging-project", type=str, help="Weights and Bias or MLflow project",
      default="asimow-vq-vae-transformer")
    a("--vqvae-model", type=str, help="Model URL for wandb or Path",
      default="model_checkpoints/VQ-VAE-Patch/vq_vae_patch_best_01.ckpt")
    a("--classification-only", action=argparse.BooleanOptionalAction)
    a("--no-early-stopping", action=argparse.BooleanOptionalAction)
    a("--class-epoch", type=int, default=2,
      help="Number of epochs for classification")
    a("--finetune-epochs", type=int, default=10,
      help="Number of epochs for classification")
    a("--model-wandb-transformer", type=str, default="",
      help="Transfomrer Model for classification")
    a("--use-all-gpus", action=argparse.BooleanOptionalAction)
    a("--pipeline-stages", type=int, default=0,
      help="Pipeline-parallel stages (GPipe over a 'pipe' mesh axis; "
           "n_blocks must divide evenly; composes with --use-all-gpus "
           "data parallelism on one mesh). 0/1 = off")
    a("--pipeline-microbatches", type=int, default=0,
      help="Microbatches streamed through the pipeline (batch size "
           "must divide evenly; default = pipeline stages)")
    a("--tensor-parallel", type=int, default=0,
      help="Megatron-style tensor-parallel ways over a 'model' mesh "
           "axis (parallel/sharding.py rules: qkv/up column-sharded, "
           "projections row-sharded; XLA inserts the all-reduces). "
           "Composes with --use-all-gpus data parallelism; mutually "
           "exclusive with --pipeline-stages. 0/1 = off")
    a("--gen-epochs", type=int, default=10,
      help="Generation epochs per iteration")
    a("--data-dir", type=str, default=None,
      help="Data root override (defaults to .env-driven path)")
    a("--seed", type=int, default=0, help="Model init / sampling seed")
    return parser


def load_dataset(hparams, only_classify=False):
    data_dict = get_val_test_ids()
    val_ids = parse_split_ids(data_dict["val_ids"])
    test_ids = parse_split_ids(data_dict["test_ids"])

    gen_dm = None
    if not only_classify:
        gen_dm, _ = get_latent_dataloader(
            bool(hparams.use_wandb), hparams.n_cycles, hparams.vqvae_model,
            val_ids, test_ids, hparams.batch_size, task="autoregressive_ids",
            data_directory_path=hparams.data_dir)
        print_training_input_shape(gen_dm)
    class_dm, model_config = get_latent_dataloader(
        bool(hparams.use_wandb), hparams.n_cycles, hparams.vqvae_model,
        val_ids, test_ids, hparams.batch_size,
        task="autoregressive_ids_classification",
        data_directory_path=hparams.data_dir)
    return (model_config["num_embeddings"], model_config["patch_size"],
            class_dm, gen_dm)


def _make_trainer(epochs, logger, *, monitor=None, mode="max", patience=None,
                  min_delta=0.001, seed=0, mesh=None, param_rules=None):
    return Trainer(max_epochs=epochs, logger=logger, monitor=monitor,
                   mode=mode, patience=patience, min_delta=min_delta,
                   accumulate_grad_batches=5, seed=seed, mesh=mesh,
                   param_rules=param_rules)


def _maybe_mesh(use_all_devices: bool, pipeline_stages: int = 0,
                tensor_parallel: int = 0):
    """--use-all-gpus == the reference's DDP switch
    (train_transformer_mtasks.py:149-152): data-parallel over every
    available accelerator via a mesh; None on a single device.
    --pipeline-stages > 1 adds a 'pipe' axis (GPipe over the block
    stack, parallel/pipeline.py); with --use-all-gpus the remaining
    devices form the 'data' axis (dp x pp on one mesh).
    --tensor-parallel > 1 instead shards params over a 'model' axis
    (Megatron rules, parallel/sharding.py), again composing with
    --use-all-gpus on the 'data' axis."""
    import jax
    devices = jax.devices()
    if pipeline_stages > 1 and tensor_parallel > 1:
        raise NotImplementedError(
            "--pipeline-stages and --tensor-parallel compose on "
            "different mesh axes ('pipe' vs 'model'); pick one per run")
    if pipeline_stages > 1:
        if len(devices) < pipeline_stages:
            raise ValueError(
                f"--pipeline-stages {pipeline_stages} needs at least that "
                f"many devices; {len(devices)} available")
        from ..parallel.mesh import make_mesh_dp_pp
        n_data = (len(devices) // pipeline_stages if use_all_devices else 1)
        return make_mesh_dp_pp(n_data=n_data, n_pipe=pipeline_stages)
    if tensor_parallel > 1:
        if len(devices) < tensor_parallel:
            raise ValueError(
                f"--tensor-parallel {tensor_parallel} needs at least that "
                f"many devices; {len(devices)} available")
        from ..parallel.mesh import make_mesh
        n_data = (len(devices) // tensor_parallel if use_all_devices else 1)
        return make_mesh(n_data=n_data, n_model=tensor_parallel)
    if not use_all_devices or len(devices) < 2:
        return None
    from ..parallel.mesh import make_mesh
    return make_mesh(n_data=len(devices))


class _TransformerRun:
    """Carries (params, state, opt_state) across alternating stages so
    the optimizer moments survive task switches like the reference's
    single LightningModule does across fresh Trainers."""

    def __init__(self, model, seed):
        self.model = model
        self.params, self.state = model.init(seed)
        self.tx = make_transformer_optimizer(model, self.params,
                                             clip_norm=0.8)
        self.opt_state = self.tx.init(self.params)

    def fit_stage(self, trainer, task, dm):
        # each reference stage builds a fresh Lightning Trainer, which
        # re-runs configure_optimizers — RAdam moments reset per stage
        # (train_transformer_mtasks.py:23-33,178-191)
        self.opt_state = self.tx.init(self.params)
        res = trainer.fit(task, dm, self.params, self.state, self.tx,
                          opt_state=self.opt_state)
        self.params, self.state = res.final_params, res.final_state
        self.opt_state = res.opt_state
        return res


def classification_finetuning(run, classification_epoch, logger, class_dm,
                              no_early_stopping=False, seed=0, trainer=None,
                              task=None):
    if trainer is None:
        trainer = _make_trainer(classification_epoch, logger, seed=seed)
    trainer.max_epochs = classification_epoch
    trainer.monitor = "val/cl/f1_score"
    trainer.mode = "max"
    trainer.patience = None if no_early_stopping else 5
    trainer.seed = seed
    task = task or TransformerClassTask(run.model)
    run.fit_stage(trainer, task, class_dm)
    return trainer.test(task, class_dm, run.params, run.state)


def main(hparams):
    from ..utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    logger = select_logger(
        use_wandb=bool(hparams.use_wandb or hparams.use_wandb_for_logging),
        use_mlflow=bool(hparams.use_mlflow),
        logging_entity=hparams.logging_entity,
        logging_project=hparams.logging_project, mlflow_url=hparams.mlflow_url)
    if hasattr(logger, "log_hyperparams"):
        logger.log_hyperparams(vars(hparams))

    num_embeddings, patch_size, class_dm, gen_dm = load_dataset(
        hparams, only_classify=bool(hparams.classification_only))
    print_training_input_shape(class_dm)

    seq_len = (hparams.n_cycles * (400 // patch_size)) + 1
    num_classes = num_embeddings + 2
    log.info(f"seq_len={seq_len} - num_classes={num_classes} - "
             f"num_embeddings={num_embeddings} - patch_size={patch_size}")

    model = TransformerDecoder(
        d_model=hparams.d_model, seq_len=seq_len, n_classes=num_classes,
        n_head=hparams.n_heads, n_blocks=hparams.n_blocks,
        class_h_bias=bool(hparams.use_class_head_bias),
        class_h_dropout=bool(hparams.use_class_head_dropout))
    pipe_stages = int(getattr(hparams, "pipeline_stages", 0) or 0)
    tp_ways = int(getattr(hparams, "tensor_parallel", 0) or 0)
    mesh = _maybe_mesh(bool(hparams.use_all_gpus), pipe_stages, tp_ways)
    param_rules = None
    if tp_ways > 1:
        from ..parallel.sharding import transformer_tp_rules
        param_rules = transformer_tp_rules
        log.info(f"tensor-parallel mesh {dict(mesh.shape)}")
    if pipe_stages > 1:
        from ..parallel.pipeline import PipelinedDecoder
        n_micro = (int(getattr(hparams, "pipeline_microbatches", 0) or 0)
                   or pipe_stages)
        data_axis = "data" if mesh.shape["data"] > 1 else None
        model = PipelinedDecoder(model, mesh, n_micro=n_micro,
                                 data_axis=data_axis)
        log.info(f"pipeline-parallel mesh {dict(mesh.shape)}, "
                 f"{n_micro} microbatches")
    elif mesh is not None:
        log.info(f"data-parallel mesh over {mesh.shape} devices")
    run = _TransformerRun(model, hparams.seed)
    n_params = sum(p.size for p in __import__("jax").tree_util.tree_leaves(
        run.params["blocks"]))
    print("number of parameters: %.4fM" % (n_params / 1e6,))

    results = {}
    if hparams.classification_only:
        if hparams.model_wandb_transformer:
            model_path = hparams.model_wandb_transformer
            if hparams.use_wandb:
                # wandb artifact link -> local ckpt (reference
                # train_transformer_mtasks.py:164-171)
                import os
                import wandb
                artifact_dir = f"./artifacts/{model_path.split('/')[-1]}"
                artifact = wandb.use_artifact(model_path, type="model")
                if not os.path.exists(artifact_dir):
                    artifact_dir = artifact.download()
                model_path = artifact_dir + "/model.ckpt"
            m, p, s = TransformerDecoder.load(model_path)
            if pipe_stages > 1:
                from ..parallel.pipeline import PipelinedDecoder
                if isinstance(p["blocks"], list):
                    p = m.stack_blocks(p)
                m = PipelinedDecoder(m, mesh, n_micro=model.n_micro,
                                     data_axis=model.data_axis)
            run.model, run.params, run.state = m, p, s
            run.tx = make_transformer_optimizer(m, p, clip_norm=0.8)
            run.opt_state = run.tx.init(p)
        results["class_test"] = classification_finetuning(
            run, hparams.class_epoch, logger, class_dm,
            no_early_stopping=bool(hparams.no_early_stopping),
            seed=hparams.seed,
            trainer=_make_trainer(hparams.class_epoch, logger,
                                  seed=hparams.seed, mesh=mesh,
                                  param_rules=param_rules))
    else:
        # tasks and trainers are created once and reused across the
        # alternating schedule so compiled epochs are shared (each
        # reference iteration builds fresh Trainers, but recompiling
        # identical graphs per stage would be pure TPU-compile waste)
        gen_task = TransformerGenTask(run.model)
        class_task = TransformerClassTask(run.model)
        gen_trainer = _make_trainer(hparams.gen_epochs, logger,
                                    seed=hparams.seed, mesh=mesh,
                                    param_rules=param_rules)
        class_trainer = _make_trainer(hparams.class_epoch, logger,
                                      seed=hparams.seed + 1, mesh=mesh,
                                      param_rules=param_rules)
        for epoch in range(hparams.epoch_iter):
            log.info("Genrerating stage")
            gen_trainer.seed = hparams.seed + epoch
            run.fit_stage(gen_trainer, gen_task, gen_dm)

            if epoch == hparams.epoch_iter - 1:
                results["class_test"] = classification_finetuning(
                    run, hparams.finetune_epochs, logger, class_dm,
                    no_early_stopping=bool(hparams.no_early_stopping),
                    seed=hparams.seed + epoch, trainer=class_trainer,
                    task=class_task)
            else:
                log.info("Classification stage")
                class_trainer.seed = hparams.seed + epoch
                run.fit_stage(class_trainer, class_task, class_dm)

        results["class_test_final"] = class_trainer.test(
            class_task, class_dm, run.params, run.state)
        results["gen_test"] = gen_trainer.test(
            gen_task, gen_dm, run.params, run.state)

    logger.finalize()
    print("Done")
    return run, results


def cli_main():
    """Console-script entry point (pyproject [project.scripts])."""
    FORMAT = "%(asctime)s - %(levelname)s - %(message)s"
    log.basicConfig(level=log.INFO, format=FORMAT)
    main(build_parser().parse_args())


if __name__ == "__main__":
    cli_main()
