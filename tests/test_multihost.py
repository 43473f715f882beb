"""Multihost integration: a REAL 2-process jax.distributed bring-up on CPU.

Each worker process initializes the process group, joins a global
('data','model') mesh spanning both processes, draws its deterministic
loader shard, assembles global batches with make_array_from_process_local_data
and computes a global mean inside jit (an implicit cross-host collective).
The parent checks both workers agree with the single-process answer and that
their data shards are disjoint and covering. (SURVEY.md §2.7: the TPU-native
replacement for a distributed DataLoader.)
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import json, sys
    import numpy as np

    coordinator, pid = sys.argv[1], int(sys.argv[2])

    from seld_tpu.parallel import multihost
    assert multihost.initialize(coordinator, 2, pid)

    import jax
    import jax.numpy as jnp
    from seld_tpu.data.loader import BatchIterator
    from seld_tpu.parallel.mesh import make_mesh

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.devices()      # 2 local x 2 processes
    assert len(jax.local_devices()) == 2

    mesh = make_mesh(4, 1)                              # global 4-way data mesh
    x = np.arange(16, dtype=np.float32).reshape(16, 1) # identical on all hosts
    y = x * 10.0
    it = BatchIterator(
        x, y, batch_size=8, shuffle=True, seed=3,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )
    it.set_epoch(1)

    @jax.jit
    def global_mean(xs):
        return jnp.mean(xs)

    order = np.arange(16)
    np.random.default_rng(3 + 1).shuffle(order)       # the loader's epoch-1 order
    rows, means = [], []
    for i, (xb, yb) in enumerate(it):
        rows.extend(int(v) for v in xb.ravel())
        xg, yg = multihost.global_batch(mesh, xb, yb)
        assert xg.shape[0] == 8                         # global batch restored
        means.append(float(global_mean(xg)))
        # local_rows inverts global_batch; allgather_rows rebuilds the
        # global batch identically on every host (the metric-pass path)
        np.testing.assert_array_equal(multihost.local_rows(xg), xb)
        full = multihost.allgather_rows(xb)
        np.testing.assert_array_equal(
            full, x[order[i * 8 : (i + 1) * 8]]
        )
    # remainder batch: 3 rows/host -> 6 global rows don't divide the 4-way
    # 'data' axis -> global_batch must allgather + REPLICATE (still a valid
    # global array; the loaders always split remainders equally per host)
    xr = np.arange(3, dtype=np.float32).reshape(3, 1) + 10.0 * jax.process_index()
    xrg = multihost.global_batch(mesh, xr)
    assert xrg.shape[0] == 6
    assert abs(float(global_mean(xrg)) - np.mean([0,1,2,10,11,12])) < 1e-6
    print("RESULT " + json.dumps({"pid": pid, "rows": rows, "means": means}))
    """
)


_TRAIN_WORKER = textwrap.dedent(
    """
    import json, sys
    import numpy as np

    coordinator, pid = sys.argv[1], int(sys.argv[2])

    from seld_tpu.parallel import multihost
    assert multihost.initialize(coordinator, 2, pid)

    import jax
    import jax.numpy as jnp
    from jax._src.config import enable_x64
    from seld_tpu.config import SELDConfig
    from seld_tpu.models import model_from_config
    from seld_tpu.parallel.mesh import make_mesh, shard_variables
    from seld_tpu.training import create_train_state, make_train_step

    assert jax.process_count() == 2 and jax.device_count() == 4

    with enable_x64(True):
        mesh = make_mesh(2, 2)                     # dp x tp across processes
        cfg = SELDConfig(
            domain="DQ", domain_classifier="DQ", input_channels=8,
            freq_dim=16, time_dim=16, cnn_filters=[8, 8, 8],
            pool_size=[[2, 2], [2, 2], [2, 2]], pool_time="TCN", D=[2],
            G=8, U=8, V=[8, 8], fc_layers=[8], batch_size=4, lr=1e-4,
            attention_impl="full", use_bias_conv=False, use_bias_linear=True,
        )
        model = model_from_config(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 8, 16, 16)))
        y = jnp.asarray(
            (rng.uniform(size=(4, 2, 168)) < 0.1).astype(np.float64)
        )
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
        step = make_train_step(model, tx, cfg)
        # device_put with a multiprocess sharding runs jax's internal
        # cross-process assert_equal — an allgather, i.e. the first
        # gloo-touching op; rendezvous first (30 s gloo window, see below)
        multihost.barrier("pre-shard")
        state = state.replace(
            params=shard_variables(mesh, state.params),
            batch_stats=shard_variables(mesh, state.batch_stats),
        )
        # each process contributes ITS batch rows; global_batch assembles the
        # dp-sharded global arrays (the production loader path)
        lo, hi = pid * 2, pid * 2 + 2
        xg, yg = multihost.global_batch(mesh, np.asarray(x[lo:hi]),
                                        np.asarray(y[lo:hi]))
        # Compile LOCALLY first, then rendezvous on the coordination-service
        # barrier (long timeout, multihost.barrier) before executing: the
        # first EXECUTION initializes the Gloo contexts with a hard 30 s
        # key-exchange window, and the multi-minute f64 compiles on this
        # 1-core host otherwise skew the two workers far past it (observed:
        # "Gloo context initialization failed: DEADLINE_EXCEEDED ... 30s").
        # warm the PERSISTENT compile cache (lower/compile is local); the
        # jitted call below then recompiles from cache in seconds, so both
        # workers reach the execution collectives right after the barrier
        step.lower(state, xg, yg).compile()
        multihost.barrier("compiled")
        state, loss1 = step(state, xg, yg)
        state, loss2 = step(state, xg, yg)

        tree_sum = jax.jit(
            lambda t: jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float64)), t, 0.0
            )
        )
        print("RESULT " + json.dumps({
            "pid": pid,
            "loss1": float(loss1), "loss2": float(loss2),
            "psum": float(tree_sum(state.params)),
            "musum": float(tree_sum(state.opt_state.inner_state[0].mu)),
            "bssum": float(tree_sum(state.batch_stats)),
        }))
    """
)


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    """VERDICT r4 #8: ONE real DQ train step (two, in fact) across 2
    processes on the global dp x tp mesh must agree with the single-process
    run — the _dryrun_impl parity assertion, distributed. f64 so any real
    sharding/collective bug stands out above reduction noise."""
    import jax
    import jax.numpy as jnp
    from jax._src.config import enable_x64

    worker_py = tmp_path / "train_worker.py"
    worker_py.write_text(_TRAIN_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if ".axon_site" not in str(v)}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_NUM_CPU_DEVICES="2",
        PYTHONPATH=repo,
        # inherit the conftest's machine-fingerprinted cache path (stale
        # cross-node XLA:CPU AOT entries can SIGILL — utils/cache.py)
        JAX_COMPILATION_CACHE_DIR=os.environ["JAX_COMPILATION_CACHE_DIR"],
    )

    def run_workers():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            coordinator = f"127.0.0.1:{s.getsockname()[1]}"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker_py), coordinator, str(i)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=600) for p in procs]
        report = "\n".join(
            f"--- worker {i} rc={p.returncode} ---\n{o}\n{e}"
            for i, (p, (o, e)) in enumerate(zip(procs, outs))
        )
        return [p.returncode for p in procs], outs, report

    # One retry: the 2-process coordination-service bring-up is sensitive to
    # this 1-core host's load (full-suite runs flaked where isolated runs
    # pass consistently). Both workers' full output is reported on failure —
    # a REAL sharding/parity bug fails both attempts identically.
    rcs, outs, report = run_workers()
    if any(rc != 0 for rc in rcs):
        print(f"first 2-process attempt failed, retrying once:\n{report}")
        rcs, outs, report = run_workers()
    assert all(rc == 0 for rc in rcs), f"train workers failed:\n{report}"
    results = {}
    for out, _err in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    assert results[0] == {**results[1], "pid": 0}, results

    # single-process ground truth (identical config/seed/batch, this process)
    from seld_tpu.config import SELDConfig
    from seld_tpu.models import model_from_config
    from seld_tpu.training import create_train_state, make_train_step

    with enable_x64(True):
        cfg = SELDConfig(
            domain="DQ", domain_classifier="DQ", input_channels=8,
            freq_dim=16, time_dim=16, cnn_filters=[8, 8, 8],
            pool_size=[[2, 2], [2, 2], [2, 2]], pool_time="TCN", D=[2],
            G=8, U=8, V=[8, 8], fc_layers=[8], batch_size=4, lr=1e-4,
            attention_impl="full", use_bias_conv=False, use_bias_linear=True,
        )
        model = model_from_config(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 8, 16, 16)))
        y = jnp.asarray((rng.uniform(size=(4, 2, 168)) < 0.1).astype(np.float64))
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
        step = make_train_step(model, tx, cfg)
        state, loss1 = step(state, x, y)
        state, loss2 = step(state, x, y)
        tree_sum = lambda t: float(
            jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float64)), t, 0.0
            )
        )
        np.testing.assert_allclose(results[0]["loss1"], float(loss1), rtol=1e-10)
        np.testing.assert_allclose(results[0]["loss2"], float(loss2), rtol=1e-10)
        np.testing.assert_allclose(
            results[0]["psum"], tree_sum(state.params), rtol=1e-9
        )
        np.testing.assert_allclose(
            results[0]["musum"],
            tree_sum(state.opt_state.inner_state[0].mu), rtol=1e-8,
        )
        np.testing.assert_allclose(
            results[0]["bssum"], tree_sum(state.batch_stats), rtol=1e-9
        )


def test_two_process_cpu_multihost(tmp_path):
    port = 0
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if ".axon_site" not in str(v)}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_NUM_CPU_DEVICES="2",
        PYTHONPATH=repo,
        # inherit the conftest's machine-fingerprinted cache path (stale
        # cross-node XLA:CPU AOT entries can SIGILL — utils/cache.py)
        JAX_COMPILATION_CACHE_DIR=os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), coordinator, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r

    # both hosts see the same global means (the collective worked), equal to
    # the single-process ground truth of the same deterministic shuffle
    assert results[0]["means"] == results[1]["means"]
    order = np.arange(16)
    np.random.default_rng(3 + 1).shuffle(order)
    want = [float(np.mean(order[i : i + 8])) for i in (0, 8)]
    np.testing.assert_allclose(results[0]["means"], want, rtol=1e-6)

    # per-host shards are disjoint and exactly cover the dataset
    r0, r1 = set(results[0]["rows"]), set(results[1]["rows"])
    assert not (r0 & r1)
    assert r0 | r1 == set(range(16))
    assert len(results[0]["rows"]) == len(results[1]["rows"]) == 8
