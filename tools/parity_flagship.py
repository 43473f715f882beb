#!/usr/bin/env python
"""Flagship-shape output parity: torch CPU mirror vs seld_tpu at (1, 8, 256, 4800).

The tiny-shape full-model gate is 5e-4 (tests/test_model.py); this one-off
pins the deviation at the canonical L3DAS21 clip scale with imported flagship
weights (reference model.py:548-615 smoke shapes), f32 everywhere.
Run on CPU: JAX_PLATFORMS=cpu python tools/parity_flagship.py
Result is recorded in PARITY.md.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch

torch.manual_seed(0)
torch.set_num_threads(max(os.cpu_count() - 1, 1))


def main():
    import jax
    import jax.numpy as jnp

    from tests.torch_seld import SELDModelT
    from seld_tpu.utils.torch_import import import_reference_state_dict
    from __graft_entry__ import _flagship_model

    dil = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]
    t0 = time.time()
    tm = SELDModelT(
        freq=256, cin=8, domain="DQ", domain_classifier="DQ",
        filters=[192, 192, 192], pool=[[8, 2], [8, 2], [2, 2]], G=384, U=384,
        V=[384, 384], vk=3, dilations=dil, fc_layers=[384],
        bias_conv=False, bias_linear=True, bn="BN",
    )
    rng = np.random.default_rng(0)
    # move BN running stats off init values with one train-mode pass
    tm.train()
    with torch.no_grad():
        tm(torch.tensor(rng.standard_normal((1, 8, 256, 4800)).astype(np.float32)))
    tm.eval()
    print(f"torch warmup pass: {time.time()-t0:.0f}s", flush=True)

    x = rng.standard_normal((1, 8, 256, 4800)).astype(np.float32)
    t0 = time.time()
    with torch.no_grad():
        sed_ref, doa_ref = tm(torch.tensor(x))
    print(f"torch forward: {time.time()-t0:.0f}s", flush=True)

    model = _flagship_model(time_dim=4800)
    variables = import_reference_state_dict(tm.state_dict())
    t0 = time.time()

    @jax.jit
    def fwd(variables, x):
        with jax.default_matmul_precision("highest"):
            return model.apply(variables, x, train=False)

    sed, doa = fwd(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    sed, doa = np.asarray(sed), np.asarray(doa)
    print(f"jax forward (incl compile): {time.time()-t0:.0f}s", flush=True)

    d_sed = float(np.max(np.abs(sed - sed_ref.numpy())))
    d_doa = float(np.max(np.abs(doa - doa_ref.numpy())))
    print(f"flagship (1,8,256,4800) parity: max|dSED|={d_sed:.3e} max|dDOA|={d_doa:.3e}")
    print(f"sed range [{sed.min():.4f},{sed.max():.4f}] doa range [{doa.min():.4f},{doa.max():.4f}]")


if __name__ == "__main__":
    main()
