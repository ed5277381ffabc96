"""CLI: training and evaluation of the TPU-native OS2D model.

Mirror of the reference main.py:15-98 — same config grammar
(`--config-file FILE key value ...`) so the reference's experiment configs
drive this framework unchanged.
"""

import argparse
import os

import jax

# persistent compilation cache: saves ~25% of the (mostly remote) compile time
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_os2d"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from os2d_tpu.config import get_default_cfg
from os2d_tpu.data.dataloader import (
    build_eval_dataloaders_from_cfg,
    build_train_dataloader_from_config,
)
from os2d_tpu.engine.objective import ObjectiveConfig
from os2d_tpu.engine.optimization import create_optimizer
from os2d_tpu.engine.train import build_trainable_mask, trainval_loop
from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.models.os2d import load_checkpoint_file
from os2d_tpu.utils.logger import set_random_seed, setup_logger


def get_data_path():
    return os.environ.get(
        "DATA_PATH", os.path.join(os.path.dirname(__file__), "data")
    )


def parse_opts():
    parser = argparse.ArgumentParser(
        description="Training and evaluation of the TPU-native OS2D model"
    )
    parser.add_argument("--config-file", default="", metavar="FILE",
                        help="path to config file", type=str)
    parser.add_argument("opts", help="Modify config options from the command line",
                        default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    return cfg, args.config_file


def build_model_from_config(cfg, logger):
    model_cfg = Os2dConfig(
        backbone_arch=cfg.model.backbone_arch.lower(),
        merge_branch_parameters=cfg.model.merge_branch_parameters,
        use_inverse_geom_model=cfg.model.use_inverse_geom_model,
        use_simplified_affine_model=cfg.model.use_simplified_affine_model,
        use_group_norm=cfg.model.use_group_norm,
        class_image_size=cfg.model.class_image_size,
        normalization_mean=tuple(cfg.model.normalization_mean),
        normalization_std=tuple(cfg.model.normalization_std),
        compute_dtype=cfg.tpu.compute_dtype,
        resample_precision=cfg.tpu.get("resample_precision", "default"),
        corr_interior_first=cfg.tpu.get("corr_interior_first", True),
        resample_t_chunk=cfg.tpu.get("resample_t_chunk", 0),
    )
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(cfg.random_seed), model_cfg)
    optimizer_state = None
    if cfg.init.model:
        logger.info(f"Loading model weights from {cfg.init.model}")
        if cfg.init.model.endswith(".pkl"):
            from os2d_tpu.utils.logger import load_checkpoint
            import jax.numpy as jnp

            ckpt = load_checkpoint(cfg.init.model)
            params = jax.tree_util.tree_map(jnp.asarray, ckpt["net"])
            optimizer_state = ckpt.get("optimizer")
        else:
            params, optimizer_state = load_checkpoint_file(cfg.init.model, model_cfg)
    if cfg.init.transform:
        logger.info(f"Loading transform weights from {cfg.init.transform}")
        import torch

        from os2d_tpu.models.os2d import import_weakalign_checkpoint

        data = torch.load(cfg.init.transform, map_location="cpu",
                          weights_only=False)
        params = import_weakalign_checkpoint(
            data["state_dict"], model_cfg, params=params
        )
    return model_cfg, model, params, optimizer_state


def main():
    cfg, config_file = parse_opts()

    # multi-host (TPU pod) SPMD: every host runs this same CLI; initialize()
    # wires the jax distributed runtime BEFORE any device query so
    # jax.devices() is the GLOBAL device list. On TPU pods the coordinator/
    # process count auto-detect from the TPU environment; elsewhere (e.g.
    # the CPU multi-process test rig) they come from the standard env vars
    # (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID).
    if bool(cfg.tpu.get("distributed_init", False)):
        kwargs = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kwargs)

    logger = setup_logger(
        "OS2D", cfg.output.path if cfg.output.save_log_to_file else None
    )
    if config_file:
        logger.info(f"Loaded configuration file {config_file}")
    set_random_seed(cfg.random_seed)

    model_cfg, model, params, _ = build_model_from_config(cfg, logger)

    objective_cfg = ObjectiveConfig(
        class_loss=cfg.train.objective.class_objective,
        margin=cfg.train.objective.neg_margin,
        margin_pos=cfg.train.objective.pos_margin,
        class_loss_neg_weight=cfg.train.objective.class_neg_weight,
        remap_classification_targets=cfg.train.objective.remap_classification_targets,
        localization_weight=cfg.train.objective.loc_weight,
        neg_to_pos_ratio=cfg.train.objective.neg_to_pos_ratio,
        rll_neg_weight_ratio=cfg.train.objective.rll_neg_weight_ratio,
    )
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    opt_state = optimizer.init(params)

    img_normalization = {
        "mean": cfg.model.normalization_mean,
        "std": cfg.model.normalization_std,
    }
    data_path = get_data_path()

    if cfg.train.do_training:
        dataloader_train, datasets_train_subset_for_eval = (
            build_train_dataloader_from_config(
                cfg, img_normalization, data_path=data_path
            )
        )
    else:
        dataloader_train, datasets_train_subset_for_eval = None, []

    dataloaders_eval = build_eval_dataloaders_from_cfg(
        cfg, img_normalization,
        datasets_for_eval=datasets_train_subset_for_eval,
        data_path=data_path,
    )

    start_iter = 0
    full_log = None
    if cfg.tpu.resume:
        import jax.numpy as jnp

        from os2d_tpu.utils.logger import load_checkpoint

        ckpt = load_checkpoint(cfg.tpu.resume)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["net"])
        if ckpt.get("optimizer") is not None:
            opt_state = jax.tree_util.tree_map(jnp.asarray, ckpt["optimizer"])
        start_iter = int(ckpt.get("i_iter") or 0)
        full_log = ckpt.get("full_log")
        logger.info(f"Resuming from {cfg.tpu.resume} at iter {start_iter}")

    # device mesh: data-parallel training + class-sharded eval
    # (cfg.tpu.mesh_data_axis: -1 = all devices, 0/1 = single-device, n = n chips)
    mesh = None
    mesh_axis = int(cfg.tpu.mesh_data_axis)
    if mesh_axis != 0 and mesh_axis != 1:
        from os2d_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        want = n_dev if mesh_axis < 0 else mesh_axis
        if want > 1 and n_dev >= want:
            mesh = make_mesh(want)
            logger.info(f"Using a {want}-device mesh for training/eval")
        elif want > n_dev:
            logger.warning(
                f"cfg.tpu.mesh_data_axis={mesh_axis} requests {want} devices "
                f"but only {n_dev} are visible; running single-device"
            )

    return trainval_loop(
        dataloader_train, model, params, cfg, objective_cfg, optimizer,
        opt_state, dataloaders_eval=dataloaders_eval, start_iter=start_iter,
        full_log=full_log, mesh=mesh,
    )


if __name__ == "__main__":
    main()
