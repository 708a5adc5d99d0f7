"""Optimizer / scheduler registry tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from eyediseasesegmentation_tpu.optim import get_optimizer, get_scheduler
from eyediseasesegmentation_tpu.optim import optimizers as O
from eyediseasesegmentation_tpu.optim import schedulers as S


def _quadratic_steps(opt, n=60, lr_key=True):
    """Minimize f(p) = ||p||^2 / 2 from p=10; return final |p|."""
    params = {"w": jnp.full((4,), 10.0)}
    state = opt.init(params)
    for _ in range(n):
        grads = {"w": params["w"]}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return float(jnp.max(jnp.abs(params["w"])))


@pytest.mark.parametrize("name", ["sgd", "adam", "rms", "adamw", "radam",
                                  "lamb", "diffgrad", "novograd", "madgrad",
                                  "ranger", "adam_lookahead", "madgrad_lookahead"])
def test_optimizers_decrease_quadratic(name):
    opt = get_optimizer(name, learning_rate=0.1, weight_decay=0.0)
    final = _quadratic_steps(opt)
    assert final < 10.0, f"{name} did not move toward the optimum"


def test_inject_hyperparams_lr_mutable():
    opt = get_optimizer("adamw", learning_rate=1e-3)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    assert float(state.hyperparams["learning_rate"]) == pytest.approx(1e-3)
    state.hyperparams["learning_rate"] = jnp.asarray(5e-4)
    updates, _ = opt.update({"w": jnp.ones(3)}, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_madgrad_matches_torch_reference():
    """Cross-check against the canonical torch implementation semantics on a
    tiny quadratic (same trajectory within tolerance)."""
    torch = pytest.importorskip("torch")

    # jax side
    opt = O.madgrad(learning_rate=0.05, momentum=0.9, weight_decay=0.0, eps=1e-6)
    p = {"w": jnp.asarray([3.0, -2.0])}
    st = opt.init(p)
    for _ in range(10):
        g = {"w": p["w"]}
        up, st = opt.update(g, st, p)
        p = optax.apply_updates(p, up)

    # torch reference trajectory (dense MADGRAD as in reference optim.py:22-180)
    tw = torch.tensor([3.0, -2.0], requires_grad=False)
    s = torch.zeros(2); v = torch.zeros(2); x0 = tw.clone()
    for k in range(10):
        g = tw.clone()
        lamb = 0.05 * (k + 1) ** 0.5
        s = s + lamb * g
        v = v + lamb * g * g
        z = x0 - s / (v.pow(1 / 3) + 1e-6)
        ck = 1 - 0.9
        tw = (1 - ck) * tw + ck * z
    np.testing.assert_allclose(np.asarray(p["w"]), tw.numpy(), rtol=1e-4, atol=1e-5)


def test_lookahead_syncs():
    base = optax.sgd(0.5)
    opt = O.lookahead(base, sync_period=2, slow_step=0.5)
    params = {"w": jnp.asarray([1.0])}
    state = opt.init(params)
    traj = []
    for _ in range(4):
        updates, state = opt.update({"w": params["w"]}, state, params)
        params = optax.apply_updates(params, updates)
        traj.append(float(params["w"][0]))
    # after sync steps the value jumps toward the slow average
    assert traj[1] != pytest.approx(traj[0] * 0.5)


def test_scheduler_registry():
    for name in ["reduce", "poly", "cos", "cos2", "cosr", "cosrd", "1cycle",
                 "exp", "clr", "multistep", "simple"]:
        sch = get_scheduler(name, lr=1e-3, num_epochs=20, batches_in_epoch=10,
                            mode="max")
        assert sch is not None
    assert get_scheduler(None, 1e-3, 10) is None
    with pytest.raises(KeyError):
        get_scheduler("nope", 1e-3, 10)


def test_reduce_on_plateau():
    sch = S.ReduceLROnPlateau(1.0, mode="max", patience=2, factor=0.1)
    lrs = []
    # metric stalls at 0.5 => after patience+1 bad epochs lr drops 10x
    for epoch, m in enumerate([0.5, 0.5, 0.5, 0.5, 0.5]):
        lrs.append(sch.epoch_lr(epoch, m))
    assert lrs[0] == 1.0
    assert lrs[-1] == pytest.approx(0.1)


def test_cosine_and_poly_monotone():
    cos = S.CosineAnnealing(1.0, t_max=10)
    vals = [cos.epoch_lr(e) for e in range(10)]
    assert vals[0] == pytest.approx(1.0)
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    poly = S.PolyLR(1.0, max_iters=10)
    vals = [poly.epoch_lr(e) for e in range(10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_cosrd_decay():
    sch = S.CosineWarmRestarts(1.0, t_0=4, gamma=0.5)
    # at the start of the second period, lr restarts but decayed by gamma^epoch
    lr_restart = sch.epoch_lr(4)
    assert lr_restart < 1.0


def test_one_cycle_shape():
    sch = S.OneCycle(1.0, total_steps=100)
    warm = [sch.batch_lr(i) for i in range(5)]
    mid = sch.batch_lr(50)
    end = sch.batch_lr(99)
    assert warm[0] < warm[-1] <= 1.0
    assert mid == pytest.approx(1.0)
    assert end < 0.2


def test_lr_scale_fn_differential():
    # encoder-prefixed params get 0.1x updates (reference get_paramgroup)
    def scale(path):
        return (0.1, 1.0) if "encoder" in path else (1.0, 1.0)

    opt = get_optimizer("sgd", learning_rate=1.0, weight_decay=0.0,
                        lr_scale_fn=scale)
    params = {"encoder": {"w": jnp.asarray([1.0])}, "head": {"w": jnp.asarray([1.0])}}
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    ratio = float(updates["encoder"]["w"][0] / updates["head"]["w"][0])
    assert ratio == pytest.approx(0.1, rel=1e-3)
