"""Optimizer registry (optax).

Parity with reference ``src/main/optim.py:182-228``: sgd / adam / rms / adamw /
radam / ranger / lamb / diffgrad / novograd / madgrad, with a ``_lookahead``
suffix wrapping any base optimizer. MADGRAD, DiffGrad and Lookahead are
implemented natively as optax gradient transformations (the reference implements
MADGRAD in-repo at optim.py:22-180).

Every optimizer is built with ``optax.inject_hyperparams`` so the learning rate
lives in the optimizer state and host-side schedulers (ReduceLROnPlateau etc.)
can adjust it without recompiling the jitted train step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# MADGRAD (Defazio & Jelassi 2021) — dense path of reference optim.py:22-180
# ---------------------------------------------------------------------------

class MadgradState(NamedTuple):
    count: jnp.ndarray
    grad_sum: Any       # s_k
    grad_sum_sq: Any    # v_k
    x0: Any             # initial params


def madgrad(learning_rate: float = 1e-2, momentum: float = 0.9,
            weight_decay: float = 0.0, eps: float = 1e-6
            ) -> optax.GradientTransformation:
    def init_fn(params):
        return MadgradState(
            count=jnp.zeros([], jnp.int32),
            grad_sum=jax.tree_util.tree_map(jnp.zeros_like, params),
            grad_sum_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            x0=jax.tree_util.tree_map(jnp.copy, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("madgrad requires params")
        k = state.count.astype(jnp.float32)
        lamb = learning_rate * jnp.sqrt(k + 1.0)

        def g_eff(g, p):
            return g + weight_decay * p if weight_decay else g

        s_new = jax.tree_util.tree_map(
            lambda g, s, p: s + lamb * g_eff(g, p), grads, state.grad_sum, params)
        v_new = jax.tree_util.tree_map(
            lambda g, v, p: v + lamb * g_eff(g, p) ** 2,
            grads, state.grad_sum_sq, params)
        ck = 1.0 - momentum
        p_new = jax.tree_util.tree_map(
            lambda s, v, x0, p: (1.0 - ck) * p + ck * (x0 - s / (jnp.cbrt(v) + eps)),
            s_new, v_new, state.x0, params)
        updates = jax.tree_util.tree_map(lambda new, old: new - old, p_new, params)
        new_state = MadgradState(state.count + 1, s_new, v_new, state.x0)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# DiffGrad (Dubey et al. 2019): Adam with a friction coefficient
# xi = sigmoid(|g_prev − g|) damping updates where the gradient is stable.
# ---------------------------------------------------------------------------

class DiffGradState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any
    prev_grad: Any


def diffgrad(learning_rate: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
             eps: float = 1e-8, weight_decay: float = 0.0
             ) -> optax.GradientTransformation:
    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return DiffGradState(jnp.zeros([], jnp.int32), z, z, z)

    def update_fn(grads, state, params):
        if weight_decay and params is not None:
            grads = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p,
                                           grads, params)
        count = state.count + 1
        c = count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                    state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                    state.nu, grads)
        mu_hat_scale = 1.0 / (1.0 - b1 ** c)
        nu_hat_scale = 1.0 / (1.0 - b2 ** c)

        def upd(m, v, g, pg):
            xi = jax.nn.sigmoid(jnp.abs(pg - g))
            return -learning_rate * xi * (m * mu_hat_scale) / (
                jnp.sqrt(v * nu_hat_scale) + eps)

        updates = jax.tree_util.tree_map(upd, mu, nu, grads, state.prev_grad)
        return updates, DiffGradState(count, mu, nu, grads)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Lookahead (Zhang et al. 2019) wrapper: slow weights synced every k steps.
# ---------------------------------------------------------------------------

class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def lookahead(base: optax.GradientTransformation, sync_period: int = 5,
              slow_step: float = 0.5) -> optax.GradientTransformation:
    def init_fn(params):
        return LookaheadState(base.init(params),
                              jax.tree_util.tree_map(jnp.copy, params),
                              jnp.zeros([], jnp.int32))

    def update_fn(grads, state, params):
        updates, inner = base.update(grads, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def on_sync(args):
            updates, params, slow = args
            fast = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            new_slow = jax.tree_util.tree_map(
                lambda s, f: s + slow_step * (f - s), slow, fast)
            # the effective update moves fast weights to the new slow weights
            new_updates = jax.tree_util.tree_map(
                lambda ns, p: ns - p, new_slow, params)
            return new_updates, new_slow

        def no_sync(args):
            updates, _, slow = args
            return updates, slow

        new_updates, new_slow = jax.lax.cond(sync, on_sync, no_sync,
                                             (updates, params, state.slow))
        return new_updates, LookaheadState(inner, new_slow, count)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def _base_optimizer(name: str, learning_rate, weight_decay, eps, wd_mask=None):
    name = name.lower()
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.sgd(learning_rate, momentum=0.9, nesterov=True),
        )
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),  # torch Adam couples wd into grad
            optax.adam(learning_rate, eps=eps),
        )
    if name == "rms":
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.rmsprop(learning_rate),
        )
    if name == "adamw":
        return optax.adamw(learning_rate, eps=eps, weight_decay=weight_decay,
                           mask=wd_mask)
    if name == "radam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.radam(learning_rate, eps=eps),
        )
    if name == "ranger":
        return lookahead(optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.radam(learning_rate, eps=eps)))
    if name == "lamb":
        return optax.lamb(learning_rate, eps=eps, weight_decay=weight_decay,
                          mask=wd_mask)
    if name == "diffgrad":
        return diffgrad(learning_rate, eps=eps, weight_decay=weight_decay)
    if name == "novograd":
        return optax.novograd(learning_rate, eps=eps, weight_decay=weight_decay)
    if name == "madgrad":
        return madgrad(learning_rate, weight_decay=weight_decay, eps=eps)
    raise KeyError(name)


def get_optimizer(optimizer_name: str, learning_rate: float,
                  weight_decay: float = 1e-5, eps: float = 1e-5,
                  lr_scale_fn=None, wd_mask=None) -> optax.GradientTransformation:
    """Build an optimizer by name; '<name>_lookahead' wraps it in Lookahead
    (reference optim.py:188-191,227-228).

    ``lr_scale_fn``: optional ``(path, param) -> (lr_mult, wd_mult)`` for
    differential learning rates (the reference's get_paramgroup). Implemented
    as a masked per-leaf scale applied after the base update.

    The learning rate is injected as a mutable hyperparameter: adjust it with
    ``train.set_learning_rate(opt_state, lr)``.
    """
    use_lookahead = False
    if len(optimizer_name.split("_")) > 1 and optimizer_name.split("_")[1] == "lookahead":
        optimizer_name = optimizer_name.split("_")[0]
        use_lookahead = True

    def make(learning_rate):
        base = _base_optimizer(optimizer_name, learning_rate, weight_decay, eps,
                               wd_mask=wd_mask)
        if lr_scale_fn is not None:
            base = _with_lr_scales(base, lr_scale_fn)
        if use_lookahead:
            base = lookahead(base)
        return base

    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def _with_lr_scales(base: optax.GradientTransformation, lr_scale_fn):
    """Scale each leaf's update by its lr multiplier after the base update.

    Exact for multiplicative-lr optimizers (the wd multiplier is handled by the
    caller via pre-scaled decayed weights if needed).
    """

    def init_fn(params):
        return base.init(params)

    def update_fn(grads, state, params):
        updates, state = base.update(grads, state, params)
        flat_updates = flatten_with_paths(updates)
        scaled = {path: u * lr_scale_fn(path)[0] for path, u in flat_updates.items()}
        return unflatten_like(scaled, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def unflatten_like(d, like):
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = [d[jax.tree_util.keystr(path)] for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
