"""Training subsystem tests: loss parity vs torch, StepLR gate semantics,
train-step smoke (loss decreases), checkpoint roundtrip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from seld_tpu.config import SELDConfig
from seld_tpu.models import SELDModel
from seld_tpu.training import (
    StepLRState,
    create_train_state,
    load_checkpoint,
    make_infer_step,
    make_train_step,
    save_checkpoint,
    seld_loss,
    set_learning_rate,
    get_learning_rate,
)
from seld_tpu.training.loss import bce_loss, mse_loss


def test_loss_matches_torch(rng):
    B, T, C, O = 3, 5, 14, 3
    sed = rng.random((B, T, C * O)).astype(np.float32) * 0.98 + 0.01
    doa = (rng.random((B, T, C * O * 3)) * 2 - 1).astype(np.float32)
    t_sed = (rng.random((B, T, C * O)) < 0.2).astype(np.float32)
    t_doa = (rng.random((B, T, C * O * 3)) * 2 - 1).astype(np.float32)
    target = np.concatenate([t_sed, t_doa], axis=-1)

    ref = (
        torch.nn.BCELoss()(torch.tensor(sed), torch.tensor(t_sed)) * 1.0
        + torch.nn.MSELoss()(torch.tensor(doa), torch.tensor(t_doa)) * 5.0
    ).item()
    got = float(seld_loss(jnp.asarray(sed), jnp.asarray(doa), jnp.asarray(target)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_bce_clamps_like_torch():
    p = jnp.asarray([0.0, 1.0, 0.5])
    t = jnp.asarray([1.0, 0.0, 1.0])
    ours = float(bce_loss(p, t))
    ref = torch.nn.BCELoss()(torch.tensor([0.0, 1.0, 0.5]), torch.tensor([1.0, 0.0, 1.0])).item()
    assert ours == pytest.approx(ref, rel=1e-6)


def test_steplr_gate_semantics():
    # lr0=0.1, gamma=0.5, step_size=2, min_lr=0.02
    s = StepLRState(lr0=0.1, step_size=2, gamma=0.5, min_lr=0.02)
    lrs = []
    for _ in range(10):
        lrs.append(s.lr)
        s = s.epoch_step()
    # epochs: 0.1, 0.1, 0.05, 0.05, 0.025, 0.025, 0.0125 -> gate freezes at 0.0125
    assert lrs[:2] == [0.1, 0.1]
    assert lrs[2:4] == pytest.approx([0.05, 0.05])
    assert lrs[4:6] == pytest.approx([0.025, 0.025])
    assert lrs[6] == pytest.approx(0.0125)
    # once below min_lr, no more stepping
    assert lrs[7:] == pytest.approx([0.0125, 0.0125, 0.0125])


def _tiny_cfg():
    return SELDConfig(
        domain="Q", input_channels=8, freq_dim=16, time_dim=16,
        cnn_filters=[8, 8, 8], pool_size=[[2, 2], [2, 2], [2, 2]],
        D=[2], G=8, U=8, V=[8, 8], fc_layers=[8], batch_size=2,
        lr=1e-3, attention_impl="full", pool_time="TCN",
    )


def _tiny_model(cfg):
    from seld_tpu.models import model_from_config

    return model_from_config(cfg)


def test_train_step_decreases_loss(rng):
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)).astype(np.float32))
    y = jnp.zeros((2, 2, 168), jnp.float32)  # time 16 -> /2/2/2 = 2
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
    step = make_train_step(model, tx, cfg)
    losses = []
    for _ in range(12):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12


@pytest.mark.slow
def test_grad_accum_matches_full_batch(rng):
    """grad_accum_steps=2 must reproduce the full-batch step when BN and
    dropout are off (gradient of a mean is linear; loss mean-of-means ==
    full-batch mean for equal microbatches). Runs in f64 so summation-order
    noise sits at 1e-15 and any real semantics bug stands out by ~8 orders
    (same rationale as __graft_entry__._dryrun_train_parity)."""
    from jax._src.config import enable_x64

    with enable_x64(True):
        cfg = _tiny_cfg().replace(
            batch_size=4, batch_norm="None", dropout_perc=0.0,
            spatial_dropout_rate=0.0,
        )
        model = _tiny_model(cfg)
        x = jnp.asarray(rng.standard_normal((4, 8, 16, 16)))
        y = jnp.asarray((rng.uniform(size=(4, 2, 168)) < 0.1).astype(np.float64))
        state0, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

        full = make_train_step(model, tx, cfg)
        sf, loss_f = full(copy(state0), x, y)
        acc = make_train_step(model, tx, cfg.replace(grad_accum_steps=2))
        sa, loss_a = acc(copy(state0), x, y)

        np.testing.assert_allclose(float(loss_a), float(loss_f), rtol=1e-12)
        for a, b in zip(
            jax.tree_util.tree_leaves(sa.params),
            jax.tree_util.tree_leaves(sf.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)
        assert int(sa.step) == 1


@pytest.mark.slow
def test_grad_accum_bn_dropout_runs(rng):
    """With BN + dropout on (the flagship setting), the accumulated step must
    run, chain running stats through the scan, and decrease the loss."""
    cfg = _tiny_cfg().replace(batch_size=4, grad_accum_steps=2)
    model = _tiny_model(cfg)
    x = jnp.asarray(rng.standard_normal((4, 8, 16, 16)).astype(np.float32))
    y = jnp.zeros((4, 2, 168), jnp.float32)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
    stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    step = make_train_step(model, tx, cfg)
    losses = []
    for _ in range(8):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # running stats moved (the scan-carried updates reached the state)
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.batch_stats),
            jax.tree_util.tree_leaves(stats0),
        )
    )
    assert moved


@pytest.mark.slow
def test_set_learning_rate_no_recompile(rng):
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)).astype(np.float32))
    y = jnp.zeros((2, 2, 168), jnp.float32)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
    step = make_train_step(model, tx, cfg)
    state, _ = step(state, x, y)
    state = set_learning_rate(state, 1e-5)
    assert get_learning_rate(state) == pytest.approx(1e-5)
    state, _ = step(state, x, y)  # must not fail or retrace to a new shape


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)).astype(np.float32))
    y = jnp.zeros((2, 2, 168), jnp.float32)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
    step = make_train_step(model, tx, cfg)
    state, _ = step(state, x, y)
    np_rng = np.random.default_rng(5)
    np_rng.random(3)  # advance
    loop = {"step": 1, "epochs": 1, "best_loss": 0.5}
    sched = StepLRState(lr0=0.1, step_size=2, gamma=0.5, min_lr=0.01, steps_taken=3)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, loop, sched, np_rng)
    expected_next = np_rng.random()

    np_rng2 = np.random.default_rng(99)
    state2, loop2, sched2 = load_checkpoint(path, np_rng2)
    assert loop2 == loop
    assert sched2.steps_taken == 3 and sched2.lr == pytest.approx(0.1 * 0.5)
    assert np_rng2.random() == pytest.approx(expected_next)  # RNG stream restored
    # params identical
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # loaded state continues training
    state2 = jax.tree_util.tree_map(jnp.asarray, state2)
    state2, loss = step(state2, x, y)
    assert np.isfinite(float(loss))


def test_infer_step_deterministic(rng):
    cfg = _tiny_cfg()
    model = _tiny_model(cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)).astype(np.float32))
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
    infer = make_infer_step(model)
    s1, d1 = infer(state.params, state.batch_stats, x)
    s2, d2 = infer(state.params, state.batch_stats, x)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_bn_running_stats_match_torch():
    """Train-mode BN running-stat updates must follow torch semantics:
    running_var uses the UNBIASED batch variance (var * n/(n-1)), running
    stats decay with retention momentum 0.9 (torch momentum 0.1). The
    round-4 training-equivalence A/B traced divergent post-training eval
    metrics to exactly this (tools/train_equivalence.py / PARITY.md)."""
    from seld_tpu.models.layers import BatchNorm

    rng = np.random.default_rng(0)
    xs = [rng.standard_normal((2, 5, 7)).astype(np.float32) for _ in range(3)]

    tbn = torch.nn.BatchNorm1d(7, eps=1e-5, momentum=0.1)
    tbn.train()
    for x in xs:
        tbn(torch.tensor(np.transpose(x, (0, 2, 1))))  # torch wants (B, C, T)

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]),
                        use_running_average=False)
    stats = variables["batch_stats"]
    for x in xs:
        _, upd = bn.apply(
            {"params": variables.get("params", {}), "batch_stats": stats},
            jnp.asarray(x), use_running_average=False,
            mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), tbn.running_mean.detach().numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), tbn.running_var.detach().numpy(), atol=1e-6
    )
