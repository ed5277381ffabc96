"""Optimizers and LR schedules (optax).

Port of os2d/engine/optimization.py:9-94: optimizer factory by name with
torch-compatible semantics (weight decay added to the gradient BEFORE the
momentum trace, as torch.optim.SGD), learning rate injected as a step argument
so the host-side schedulers (MultiStepLR / ReduceLROnPlateau with median
smoothing) can change it without recompilation.
"""

from __future__ import annotations

import logging
from statistics import median

import jax
import jax.numpy as jnp
import optax


def ceildiv(a, b):
    return -(-a // b)


def create_optimizer(cfg, trainable_mask=None):
    """Build an optax transform; lr is passed per-step via the update's
    `learning_rate` hyperparameter (we scale by -lr at the end).

    Args:
      cfg: cfg.train.optim node.
      trainable_mask: pytree of bools matching params; False leaves get zero
        updates (the reference drops them from the optimizer entirely,
        feature_extractor.py:84-87).
    """
    method = cfg.optim_method.casefold()
    wd = float(cfg.weight_decay)

    if method == "sgd":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.trace(decay=float(cfg.sgd_momentum)) if cfg.sgd_momentum else optax.identity(),
        )
    elif method == "adagrad":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_rss(),
        )
    elif method == "adadelta":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adadelta(),
        )
    elif method == "adam":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adam(),
        )
    elif method == "adamax":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adamax(),
        )
    elif method == "rmsprop":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_rms(),
        )
    else:
        raise RuntimeError(f"Invalid optim method: {cfg.optim_method}")

    # lr exposed via inject_hyperparams for runtime control without recompiles
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(core, optax.scale(-learning_rate))
    )(learning_rate=float(cfg.lr))

    if trainable_mask is not None:
        tx = optax.chain(tx, _mask_updates(trainable_mask))
    return tx


def _mask_updates(mask_tree):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        masked = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask_tree
        )
        return masked, state

    return optax.GradientTransformation(init_fn, update_fn)


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr inside an inject_hyperparams state."""
    return _set_hyperparam(opt_state, "learning_rate", lr)


def get_learning_rate(opt_state):
    hp = _find_hyperparams(opt_state)
    return float(hp["learning_rate"])


def _find_hyperparams(opt_state):
    if isinstance(opt_state, optax.InjectStatefulHyperparamsState) or hasattr(
        opt_state, "hyperparams"
    ):
        return opt_state.hyperparams
    for s in opt_state:
        try:
            return _find_hyperparams(s)
        except (TypeError, AttributeError, IndexError):
            continue
    raise AttributeError("no hyperparams found in optimizer state")


def _set_hyperparam(opt_state, name, value):
    hp = _find_hyperparams(opt_state)
    hp[name] = jnp.asarray(value, jnp.float32)
    return opt_state


def setup_lr(full_log, cfg, eval_iter, initial_steps=0):
    """Host-side LR controller (os2d/engine/optimization.py:53-94).

    Returns anneal_lr_func(i_iter, current_lr, anneal_now=True) -> new lr.
    initial_steps replays a resume position into the MultiStepLR counter.
    """
    logger = logging.getLogger("OS2D.lr")
    kind = cfg.type.lower()

    if kind == "none":
        def anneal(i_iter, lr, anneal_now=True):
            return lr
        return anneal

    if kind == "multisteplr":
        milestones = sorted(ceildiv(m, eval_iter) for m in cfg.milestones)
        state = {"num_steps": int(initial_steps)}

        def anneal(i_iter, lr, anneal_now=True):
            state["num_steps"] += 1
            if state["num_steps"] in milestones:
                new_lr = lr * cfg.gamma
                logger.info(f"MultiStepLR: lr {lr} -> {new_lr}")
                return new_lr
            return lr

        return anneal

    if kind == "reducelronplateau":
        patience = ceildiv(cfg.patience, eval_iter)
        cooldown = ceildiv(cfg.cooldown, eval_iter)
        buffer_len = max(ceildiv(cfg.quantity_smoothness, eval_iter), 1)
        state = {
            "best": None,
            "num_bad": 0,
            "cooldown_counter": 0,
            "buffer": [],
        }
        mode = cfg.quantity_mode
        eps = cfg.quantity_epsilon

        def is_better(cur, best):
            if best is None:
                return True
            if mode == "max":
                return cur > best * (1.0 + eps) if best >= 0 else cur > best * (1.0 - eps)
            return cur < best * (1.0 - eps) if best >= 0 else cur < best * (1.0 + eps)

        def anneal(i_iter, lr, anneal_now=True):
            values = full_log.get(cfg.quantity_to_monitor, [])
            if not values:
                return lr
            state["buffer"].append(values[-1])
            if len(state["buffer"]) > buffer_len:
                state["buffer"].pop(0)
            averaged = median(state["buffer"])
            if not anneal_now:
                return lr
            if state["cooldown_counter"] > 0:
                state["cooldown_counter"] -= 1
                state["num_bad"] = 0
            if is_better(averaged, state["best"]):
                state["best"] = averaged
                state["num_bad"] = 0
            else:
                state["num_bad"] += 1
            if state["num_bad"] > patience:
                new_lr = max(lr * cfg.reduce_factor, cfg.min_value)
                if new_lr < lr:
                    logger.info(f"ReduceLROnPlateau: lr {lr} -> {new_lr}")
                state["cooldown_counter"] = cooldown
                state["num_bad"] = 0
                return new_lr
            return lr

        return anneal

    raise RuntimeError(f"Unknown anneal_lr type: {cfg.type}")
