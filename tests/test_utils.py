"""Smoke tests: visualization, log plotting, launcher scripts, meters log."""

import os

import numpy as np

from os2d_tpu.utils.logger import (
    checkpoint_model,
    init_log,
    load_checkpoint,
    log_meters,
    mine_log_value,
)
from os2d_tpu.utils.visualization import (
    plot_train_log,
    show_class_heatmap,
    show_detections,
    show_gt_boxes,
    show_mined_patches,
)


def test_visualizations_save_files(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(120, 160, 3).astype(np.float32)
    boxes = np.array([[10, 10, 60, 60], [40, 20, 100, 90]], np.float32)
    scores = np.array([0.9, 0.4], np.float32)
    labels = np.array([0, 1])
    corners = rng.uniform(0, 100, (2, 8)).astype(np.float32)

    p1 = show_detections(img, boxes, scores, labels, corners=corners,
                         save_path=str(tmp_path / "det.png"))
    p2 = show_gt_boxes(img, boxes, labels, difficult=np.array([False, True]),
                       save_path=str(tmp_path / "gt.png"))
    p3 = show_class_heatmap(img, rng.randn(8, 10), rng.randn(8, 10),
                            save_path=str(tmp_path / "heat.png"))
    recs = [
        {"role": "neg", "crop_position_xyxy": boxes[0], "label_global": 3,
         "loss": 0.5},
        {"role": "pos", "crop_position_xyxy": boxes[1], "label_global": 1,
         "loss": 0.2},
    ]
    p4 = show_mined_patches(img, recs, save_path=str(tmp_path / "mined.png"))
    for p in (p1, p2, p3, p4):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_log_meters_and_plot(tmp_path):
    full_log = init_log()
    import time

    t0 = time.time()
    log_meters(full_log, t0, -1, str(tmp_path),
               meters_eval={"ds": {"mAP@0.50": 0.5}})
    log_meters(full_log, t0, 99, str(tmp_path),
               meters_running={"loss": 1.0},
               meters_eval={"ds": {"mAP@0.50": 0.7}})
    assert os.path.exists(tmp_path / "train_log.pkl")
    # NaN-padded equal lengths
    lengths = {len(v) for v in full_log.values()}
    assert lengths == {2}
    assert mine_log_value(full_log, "mAP@0.50_ds", "max") == 0.7

    p = plot_train_log(full_log, save_path=str(tmp_path / "plot.png"))
    assert os.path.exists(p)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": np.ones((3,), np.float32), "b": [np.zeros((2, 2))]}
    path = checkpoint_model(params, None, str(tmp_path), i_iter=5)
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["net"]["a"], params["a"])
    assert ckpt["optimizer"] is None


def test_launcher_generates_scripts(tmp_path, capsys):
    from os2d_tpu.utils import launcher

    launcher.JOB_QUEUE_NAMES.clear()
    launcher.JOB_QUEUE_PATHS.clear()
    launcher.JOB_QUEUE_COMMANDS.clear()
    launcher.JOB_QUEUE_LOG_FILE_PREFIX.clear()

    launcher.add_job("job-a", str(tmp_path / "a"), ["echo hello"], "")
    launcher.add_job("job-b", str(tmp_path / "b"), ["echo world"], "")

    parser = launcher.create_args_parser()
    args = parser.parse_args(["--no-launch", "--job-names", "job-a"])
    launcher.launch_all_jobs(args)
    assert os.path.exists(tmp_path / "a" / "launch.sh")
    assert not os.path.exists(tmp_path / "b" / "launch.sh")

    args = parser.parse_args(["--no-launch", "--slurm", "-p", "part1"])
    launcher.launch_all_jobs(args)
    content = open(tmp_path / "b" / "launch.sh").read()
    assert "#SBATCH --partition part1" in content
    assert "echo world" in content

    args = parser.parse_args(["--no-launch", "--xpk", "--tpu-type", "v5litepod-8"])
    launcher.launch_all_jobs(args)
    out = capsys.readouterr().out
    assert "xpk workload create" in out and "v5litepod-8" in out


def test_checkpoint_resume_payload(tmp_path):
    params = {"a": np.ones((3,), np.float32)}
    full_log = {"iter": [0, 1], "loss": [1.0, 0.5]}
    path = checkpoint_model(params, None, str(tmp_path), i_iter=7,
                            full_log=full_log)
    ckpt = load_checkpoint(path)
    assert ckpt["i_iter"] == 7
    assert ckpt["full_log"]["loss"] == [1.0, 0.5]


def test_checkpoint_orbax_backend(tmp_path):
    import jax.numpy as jnp

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    path = checkpoint_model(params, {"momentum": np.ones((2, 3), np.float32)},
                            str(tmp_path), i_iter=3, backend="orbax")
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(ckpt["net"]["w"]), params["w"])
    np.testing.assert_array_equal(
        np.asarray(ckpt["optimizer"]["momentum"]), np.ones((2, 3))
    )


def test_setup_lr_multistep():
    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.optimization import setup_lr

    cfg = get_default_cfg().train.optim.anneal_lr
    cfg.type = "MultiStepLR"
    cfg.milestones = [2000, 4000]
    cfg.gamma = 0.1
    anneal = setup_lr({}, cfg, eval_iter=1000)
    lr = 1.0
    lrs = []
    for i in range(5):
        lr = anneal(i, lr)
        lrs.append(lr)
    np.testing.assert_allclose(lrs, [1.0, 0.1, 0.1, 0.01, 0.01], rtol=1e-9)


def test_setup_lr_multistep_resume_replays_counter():
    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.optimization import setup_lr

    cfg = get_default_cfg().train.optim.anneal_lr
    cfg.type = "MultiStepLR"
    cfg.milestones = [2000]
    anneal = setup_lr({}, cfg, eval_iter=1000, initial_steps=2)
    # milestone (step 2) already passed before resume -> no further decay
    assert anneal(0, 1.0) == 1.0


def test_setup_lr_plateau_reduces_after_patience():
    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.optimization import setup_lr

    cfg = get_default_cfg().train.optim.anneal_lr
    cfg.type = "ReduceLROnPlateau"
    cfg.patience = 2000
    cfg.cooldown = 0
    cfg.quantity_smoothness = 0
    cfg.reduce_factor = 0.5
    cfg.min_value = 1e-5
    cfg.quantity_to_monitor = "metric"
    full_log = {"metric": []}
    anneal = setup_lr(full_log, cfg, eval_iter=1000)
    lr = 1.0
    values = [0.5, 0.6, 0.6, 0.6, 0.6, 0.6]  # stalls after the second eval
    lrs = []
    for i, v in enumerate(values):
        full_log["metric"].append(v)
        lr = anneal(i, lr)
        lrs.append(lr)
    assert lrs[-1] < 1.0  # reduced after patience exhausted
