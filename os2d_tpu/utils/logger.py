"""Logging, metric series, and checkpointing.

Port of os2d/utils/logger.py:12-225: hierarchical loggers, in-memory metric
series NaN-padded to equal length and pickled to train_log.pkl (so the
reference's collect/plot tooling keeps working), and model checkpoints. JAX
checkpoints store the params/opt-state pytrees as numpy inside a pickle with
the same {"net", "optimizer", ...} top-level layout as the reference
(logger.py:137-160).
"""

from __future__ import annotations

import datetime
import logging
import math
import os
import pickle
import random
import sys
import time

import numpy as np


def setup_logger(name="OS2D", log_path=None):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_path:
        os.makedirs(log_path, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_path, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def time_since(t_start):
    return str(datetime.timedelta(seconds=int(time.time() - t_start)))


def time_for_printing(seconds):
    return str(datetime.timedelta(seconds=int(seconds)))


def print_meters(meters, logger):
    if meters:
        logger.info(
            ", ".join(
                f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}"
                for k, v in meters.items()
                if not isinstance(v, (list, dict, np.ndarray))
            )
        )


def add_to_meters_in_dict(meters, target):
    for k, v in meters.items():
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            target[k] = target.get(k, 0.0) + v


def init_log():
    return {}


def log_meters(full_log, t_start, i_iter, output_path,
               meters_running=None, meters_eval=None, anneal_lr=None):
    """Append one evaluation point to every metric series; NaN-pad new series
    (os2d/utils/logger.py:12-85). Pickles to <output_path>/train_log.pkl."""

    def add(name, value):
        series = full_log.setdefault(name, [])
        series.append(value)

    point_names = set()
    add("iter", i_iter)
    point_names.add("iter")
    add("time", time.time() - t_start)
    point_names.add("time")

    if meters_running:
        for k, v in meters_running.items():
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                add("train_" + k, float(v))
                point_names.add("train_" + k)
    if meters_eval:
        for dataset_name, meters in meters_eval.items():
            for k, v in meters.items():
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    name = f"{k}_{dataset_name}"
                    add(name, float(v))
                    point_names.add(name)

    # NaN-pad all series to equal length
    max_len = max(len(s) for s in full_log.values())
    for series in full_log.values():
        while len(series) < max_len:
            series.append(float("nan"))

    from ..parallel.mesh import primary_host

    if output_path and primary_host():  # one writer in multi-host runs
        os.makedirs(output_path, exist_ok=True)
        try:
            with open(os.path.join(output_path, "train_log.pkl"), "wb") as f:
                pickle.dump(full_log, f)
        except OSError as e:
            logging.getLogger("OS2D").warning(f"Could not save train_log.pkl: {e}")
    return full_log


def _to_numpy_tree(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def checkpoint_model(params, opt_state, output_path, i_iter=None, model_name=None,
                     extra_fields=None, full_log=None, backend="pickle"):
    """Save {"net": params, "optimizer": opt_state, **extra} (logger.py:137-160).

    Unlike the reference (which loses iteration / schedule / log state,
    SURVEY.md §5.4), the payload carries i_iter and the metric log so training
    resumes exactly. backend="orbax" stores the pytrees via
    orbax.checkpoint.PyTreeCheckpointer in a sibling directory instead of
    inline pickle arrays.

    Multi-host (pod) runs: only process 0 writes — every host computes the
    same replicated params, so one copy suffices; non-primary hosts return
    the path unwritten (reload-best-on-anneal therefore needs output_path
    on storage shared across hosts, the standard pod setup).
    """
    from ..parallel.mesh import primary_host

    if model_name is not None:
        fname = f"checkpoint_{model_name}.pkl"
    else:
        fname = f"checkpoint_iter_{i_iter}.pkl"
    path = os.path.join(output_path, fname)
    if not primary_host():
        return path
    os.makedirs(output_path, exist_ok=True)
    payload = {
        "i_iter": i_iter,
        "full_log": full_log,
    }
    if backend == "orbax":
        import orbax.checkpoint as ocp

        tree_dir = os.path.abspath(path[: -len(".pkl")] + ".orbax")
        if os.path.isdir(tree_dir):
            import shutil

            shutil.rmtree(tree_dir)
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(
            tree_dir,
            {"net": params, "optimizer": opt_state if opt_state is not None else {}},
        )
        payload["orbax_dir"] = tree_dir
        payload["net"] = None
        payload["optimizer"] = None
    else:
        payload["net"] = _to_numpy_tree(params)
        payload["optimizer"] = (
            _to_numpy_tree(opt_state) if opt_state is not None else None
        )
    if extra_fields:
        payload.update(extra_fields)
    try:
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        logging.getLogger("OS2D").info(f"Saved checkpoint to {path}")
    except OSError as e:
        logging.getLogger("OS2D").error(f"Could not save checkpoint {path}: {e}")
    return path


def load_checkpoint(path):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("orbax_dir"):
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(payload["orbax_dir"])
        payload["net"] = restored["net"]
        payload["optimizer"] = restored.get("optimizer") or None
    return payload


# ---------------------------------------------------------------------------
# Log mining utilities (os2d/utils/logger.py:163-225) — used by the
# experiment collect scripts to scrape metrics out of logs.
# ---------------------------------------------------------------------------

def extract_pattern_after_marked_line(log_path, marker, pattern):
    import re

    with open(log_path) as f:
        lines = f.readlines()
    values = []
    triggered = False
    rx = re.compile(pattern)
    for line in lines:
        if triggered:
            m = rx.search(line)
            if m:
                values.append(float(m.group(1)))
                triggered = False
        if marker in line:
            triggered = True
    return values


def extract_map_value_from_os2d_log(log_path, eval_dataset,
                                    metric_name="mAP@0.50"):
    import re

    numeric = r"([-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)"
    values = extract_pattern_after_marked_line(
        log_path, f"Evaluating on {eval_dataset}", rf"{re.escape(metric_name)}\D*{numeric}"
    )
    return values[-1] if values else None


def mine_log_value(full_log, name, mode="max"):
    series = [v for v in full_log.get(name, []) if not math.isnan(v)]
    if not series:
        return None
    if mode == "max":
        return max(series)
    if mode == "min":
        return min(series)
    if mode == "first":
        return series[0]
    if mode == "last":
        return series[-1]
    raise ValueError(mode)
