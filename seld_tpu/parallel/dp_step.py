"""Explicit shard_map data-parallel training step.

The default train step (seld_tpu.training.steps) relies on the XLA SPMD
partitioner to insert collectives from input shardings ("computation follows
data"). This module provides the explicit alternative: the per-shard step is
written against local batch shards and the gradient/loss reduction is a
visible ``lax.pmean`` over the ``data`` mesh axis, wrapped in
``jax.shard_map`` — the idiomatic pattern when you want the collective
schedule under your control (e.g. to later overlap grad reduction with the
backward pass, or to add reduce_scatter/all_gather optimizer sharding).

BatchNorm semantics: statistics are computed per shard and pmean'd into the
running stats — the running means match global-batch training exactly (equal
shard sizes), running variances differ by the inter-shard mean spread. This
matches torch DataParallel's per-replica BN (the reference's vestigial DP
path, reference train.py:27-66).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from seld_tpu.training.loss import seld_loss
from seld_tpu.training.steps import TrainState


def make_dp_train_step(model, tx, cfg, mesh):
    """Jitted shard_map train step: state replicated, batch sharded on 'data'."""
    precision = "highest" if cfg.compute_dtype == "float32" else "default"

    def step_shard(state: TrainState, x, y):
        step_rng = jax.random.fold_in(state.rng, state.step)
        # decorrelate dropout across shards
        step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index("data"))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, updates = model.apply(
                variables, x, train=True,
                rngs={"dropout": step_rng},
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            sed, doa = out
            loss = seld_loss(
                sed, doa, y,
                output_classes=cfg.output_classes,
                class_overlaps=int(cfg.class_overlaps),
                sed_weight=cfg.sed_loss_weight,
                doa_weight=cfg.doa_loss_weight,
            )
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # THE collectives: grads/loss/BN stats averaged over the data axis
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt_state,
            ),
            loss,
        )

    sharded = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x, y):
        with jax.default_matmul_precision(precision):
            return sharded(state, x, y)

    return train_step


def replicate_state(state, mesh):
    """Place a TrainState fully replicated on the mesh."""
    return jax.device_put(state, NamedSharding(mesh, P()))
