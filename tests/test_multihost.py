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
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
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
