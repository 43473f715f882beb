"""Jit-compiled train / eval / inference steps.

One fused XLA program per step (forward + backward + Adam update), with
donated state buffers. Replaces the reference's per-batch
zero_grad/backward/step loop (train.py:546-560). The learning rate is a
dynamic optax hyperparameter so the host-side StepLR schedule can update it
without recompiling.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from seld_tpu.training.loss import seld_loss

# f32 runs pin matmul precision to 'highest' inside every step (inputs would
# otherwise be truncated to bfloat16 on the TPU MXU, breaking the <=1e-5
# parity target); the bf16 fast path opts out via cfg.compute_dtype.


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with torch-default hyperparameters (reference train.py:502) and an
    injectable learning rate."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(model, cfg, rng, sample_input) -> Tuple[TrainState, optax.GradientTransformation]:
    init_rng, state_rng = jax.random.split(rng)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(init_rng, sample_input)
    tx = make_optimizer(cfg.lr)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
    )
    return state, tx


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected learning-rate hyperparameter (no recompile)."""
    opt_state = state.opt_state
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyper))


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def make_train_step(model, tx, cfg):
    """Returns jitted (state, x, y) -> (state, loss). x is (B, C, F, T).

    With ``cfg.grad_accum_steps > 1`` the batch is split into that many
    sequential microbatches under ``lax.scan``: gradients are averaged into
    ONE Adam update, dropout draws a fresh key per microbatch, and BatchNorm
    normalizes per microbatch with running stats chained through the scan —
    torch gradient-accumulation semantics. Activation memory is a single
    microbatch's, so any batch size trains in a fixed footprint (the b64+
    knob; BENCH.md round 4)."""
    precision = "highest" if cfg.compute_dtype == "float32" else "default"
    accum = max(int(getattr(cfg, "grad_accum_steps", 1) or 1), 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, y):
        with jax.default_matmul_precision(precision):
            return _train_step_impl(state, x, y)

    def loss_fn(params, batch_stats, x, y, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, updates = model.apply(
            variables, x, train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"] if batch_stats else [],
        )
        sed, doa = out
        loss = seld_loss(
            sed, doa, y,
            output_classes=cfg.output_classes,
            class_overlaps=int(cfg.class_overlaps),
            sed_weight=cfg.sed_loss_weight,
            doa_weight=cfg.doa_loss_weight,
        )
        return loss, updates.get("batch_stats", batch_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _train_step_impl(state: TrainState, x, y):
        step_rng = jax.random.fold_in(state.rng, state.step)

        # per-shape trace-time dispatch: a remainder batch that doesn't
        # divide (loader.py yields at most one per epoch) runs the direct
        # step at its own shape instead of asserting
        if accum > 1 and x.shape[0] % accum == 0 and x.shape[0] >= accum:
            b = x.shape[0]
            mb = b // accum
            xs = x.reshape(accum, mb, *x.shape[1:])
            ys = y.reshape(accum, mb, *y.shape[1:])

            def body(carry, inp):
                stats, gsum, i = carry
                xi, yi = inp
                (loss, stats), g = grad_fn(
                    state.params, stats, xi, yi,
                    jax.random.fold_in(step_rng, i),
                )
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (stats, gsum, i + 1), loss

            gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            carry0 = (state.batch_stats, gzero, jnp.zeros((), jnp.int32))
            (new_stats, gsum, _), losses = jax.lax.scan(
                body, carry0, (xs, ys)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            loss = jnp.mean(losses)
        else:
            (loss, new_stats), grads = grad_fn(
                state.params, state.batch_stats, x, y, step_rng
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss

    return train_step


def make_eval_step(model, cfg):
    """Returns jitted (state, x, y) -> loss (no mutation, eval-mode BN/dropout)."""
    precision = "highest" if cfg.compute_dtype == "float32" else "default"

    @jax.jit
    def eval_step(params, batch_stats, x, y):
        with jax.default_matmul_precision(precision):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            sed, doa = model.apply(variables, x, train=False)
            return seld_loss(
                sed, doa, y,
                output_classes=cfg.output_classes,
                class_overlaps=int(cfg.class_overlaps),
                sed_weight=cfg.sed_loss_weight,
                doa_weight=cfg.doa_loss_weight,
            )

    return eval_step


def make_infer_step(model, precision: str = "highest"):
    """Returns jitted (params, batch_stats, x) -> (sed, doa)."""

    @jax.jit
    def infer_step(params, batch_stats, x):
        with jax.default_matmul_precision(precision):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, x, train=False)

    return infer_step
