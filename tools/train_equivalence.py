#!/usr/bin/env python
"""Training-equivalence A/B: seld_tpu's train loop vs the torch reference loop.

Controlled experiment (VERDICT r3 #4): identical imported init, identical
deterministic batch stream (data/synthetic.py), dropout off, f64 arithmetic.
Trains N steps in BOTH frameworks with the reference's optimizer/loss
semantics (Adam lr, betas (0.9, 0.999), eps 1e-8 — reference train.py:502;
loss = BCE(sed) + 5*MSE(doa) — reference train.py:186-204; per-batch
zero_grad/backward/step — reference train.py:546-560) and pins:

  1. per-step loss agreement over the whole run,
  2. eval-mode output agreement of the two TRAINED models on a held-out set
     (this exercises the BN running-stat update semantics end-to-end),
  3. the full 16-column evaluate_test metric row (reference train.py:84-166)
     computed from each framework's outputs — integer counts must be EQUAL.

Run:  JAX_PLATFORMS=cpu python tools/train_equivalence.py
Env:  TE_STEPS (default 60), TE_BATCH (default 2), TE_F64 (default 1).
Results recorded in PARITY.md ("Training equivalence" section).
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

F64 = os.environ.get("TE_F64", "1") == "1"
if F64:
    jax.config.update("jax_enable_x64", True)

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.join(_here, "tests"))

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.manual_seed(0)
if F64:
    torch.set_default_dtype(torch.float64)

N_STEPS = int(os.environ.get("TE_STEPS", "60"))
BATCH = int(os.environ.get("TE_BATCH", "2"))
LR = float(os.environ.get("TE_LR", "1e-4"))

# small-but-real DQ config: full model stack (3 Hamilton CNN stages with BN +
# pooling, TCN ResBlocks with fibonacci dilations, attention, V convs, dual
# FC heads), scaled to freq 64 / time 64 so 60 f64 CPU steps stay tractable
CFGKW = dict(
    domain="DQ", domain_classifier="DQ", input_channels=8, freq_dim=64,
    time_dim=64, cnn_filters=[16, 16, 16], pool_size=[[4, 2], [4, 2], [2, 2]],
    pool_time="TCN", D=[2], dilation_mode="fibonacci", G=32, U=32,
    V=[32, 32], fc_layers=[32], batch_size=BATCH, lr=LR,
    attention_impl="full", use_bias_conv=False, use_bias_linear=True,
    batch_norm="BN", dropout_perc=0.0, spatial_dropout_rate=0.0,
    num_frames=8, use_remat=False,
)
DIL = [1, 1]  # fibonacci prefix for D=[2]


def make_data():
    from seld_tpu.data.synthetic import make_task2_example

    rng = np.random.default_rng(7)
    train = [
        make_task2_example(rng, channels=8, freq=64, time_frames=64, label_frames=8)
        for _ in range(12)
    ]
    test = [
        make_task2_example(rng, channels=8, freq=64, time_frames=64, label_frames=8)
        for _ in range(4)
    ]
    xs = np.stack([x for x, _ in train])
    ys = np.stack([y for _, y in train])
    xt = np.stack([x for x, _ in test])
    yt = np.stack([y for _, y in test])
    # deterministic batch stream: fixed-seed permutation per epoch
    order_rng = np.random.default_rng(11)
    batches = []
    idx = np.arange(len(xs))
    while len(batches) < N_STEPS:
        order_rng.shuffle(idx)
        for i in range(0, len(idx) - BATCH + 1, BATCH):
            batches.append(idx[i : i + BATCH].copy())
    return xs, ys, xt, yt, batches[:N_STEPS]


def torch_model():
    from tests.torch_seld import SELDModelT

    tm = SELDModelT(
        freq=64, cin=8, domain="DQ", domain_classifier="DQ",
        filters=[16, 16, 16], pool=[[4, 2], [4, 2], [2, 2]], G=32, U=32,
        V=[32, 32], vk=3, dilations=DIL, fc_layers=[32],
        bias_conv=False, bias_linear=True, bn="BN",
    )
    if F64:
        tm = tm.double()
    return tm


def torch_loss(sed, doa, y):
    n_sed = 42
    bce = torch.nn.BCELoss()(sed, y[..., :n_sed])
    mse = torch.nn.MSELoss()(doa, y[..., n_sed:])
    return bce * 1.0 + mse * 5.0


def run_torch(tm, xs, ys, xt, batches):
    dt = torch.float64 if F64 else torch.float32
    opt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.9, 0.999), eps=1e-8)
    losses = []
    tm.train()
    for b in batches:
        x = torch.tensor(xs[b], dtype=dt)
        y = torch.tensor(ys[b], dtype=dt)
        opt.zero_grad()
        sed, doa = tm(x)
        loss = torch_loss(sed, doa, y)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    tm.eval()
    with torch.no_grad():
        sed, doa = tm(torch.tensor(xt, dtype=dt))
    return np.array(losses), sed.numpy(), doa.numpy()


def run_jax(init_state_dict, xs, ys, xt, batches):
    import jax.numpy as jnp

    from seld_tpu.config import SELDConfig
    from seld_tpu.models import model_from_config
    from seld_tpu.training.steps import TrainState, make_optimizer, make_train_step, make_infer_step
    from seld_tpu.utils.torch_import import import_reference_state_dict

    cfg = SELDConfig(**CFGKW)
    model = model_from_config(cfg)
    variables = import_reference_state_dict(init_state_dict)
    dt = jnp.float64 if F64 else jnp.float32
    cast = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), t)
    params = cast(variables["params"])
    batch_stats = cast(variables.get("batch_stats", {}))
    tx = make_optimizer(cfg.lr)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), rng=jax.random.PRNGKey(0),
    )
    step = make_train_step(model, tx, cfg)
    losses = []
    for b in batches:
        state, loss = step(state, jnp.asarray(xs[b], dt), jnp.asarray(ys[b], dt))
        losses.append(float(loss))
    infer = make_infer_step(model)
    sed, doa = infer(state.params, state.batch_stats, jnp.asarray(xt, dt))
    return np.array(losses), np.asarray(sed), np.asarray(doa)


def metric_row(sed, doa, yt, cfg):
    """16-column evaluate_test row from raw outputs (reference train.py:84-166)."""
    from seld_tpu.metrics import SELDMetrics
    from seld_tpu.training.trainer import evaluate_test_outputs

    m = SELDMetrics(nb_classes=cfg.output_classes, doa_threshold=cfg.Dcase21_metrics_DOA_threshold)
    TP = FP = FN = 0
    for i in range(sed.shape[0]):
        tp, fp, fn = evaluate_test_outputs(sed[i], doa[i], yt[i], m, cfg)
        TP, FP, FN = TP + tp, FP + fp, FN + fn
    eps = sys.float_info.epsilon
    precision = TP / (TP + FP + eps)
    recall = TP / (TP + FN + eps)
    F = 2 * precision * recall / (precision + recall + eps)
    ER, Fd, LE, LR = m.compute_seld_scores()
    return [TP, FP, FN, round(F, 6), round(ER, 6), round(Fd, 6), round(LE, 4), round(LR, 6)]


def main():
    from seld_tpu.config import SELDConfig

    cfg = SELDConfig(**CFGKW)
    xs, ys, xt, yt, batches = make_data()
    tm = torch_model()
    init_sd = {k: v.detach().clone() for k, v in tm.state_dict().items()}

    t0 = time.time()
    tl, tsed, tdoa = run_torch(tm, xs, ys, xt, batches)
    print(f"torch {N_STEPS} steps: {time.time()-t0:.0f}s  loss {tl[0]:.6f} -> {tl[-1]:.6f}", flush=True)

    t0 = time.time()
    jl, jsed, jdoa = run_jax(init_sd, xs, ys, xt, batches)
    print(f"jax   {N_STEPS} steps: {time.time()-t0:.0f}s  loss {jl[0]:.6f} -> {jl[-1]:.6f}", flush=True)

    # CHAOS-ENVELOPE CONTROL: the torch reference ALONE, restarted from the
    # same init perturbed by one part in 1e13 (~f64 rounding scale). Any
    # torch-vs-jax divergence growing at or below this envelope's rate is
    # rounding amplification through the training map, not an
    # implementation difference (same argument as tools/parity_flagship.py).
    tm_c = torch_model()
    with torch.no_grad():
        sd_c = {k: v * (1.0 + 1e-13) for k, v in init_sd.items()}
        tm_c.load_state_dict(sd_c)
    cl, csed, cdoa = run_torch(tm_c, xs, ys, xt, batches)
    print(f"torch control (init*1+1e-13): loss {cl[0]:.6f} -> {cl[-1]:.6f}", flush=True)

    dl = np.abs(tl - jl)
    dc = np.abs(tl - cl)
    print(f"per-step |dloss| torch-vs-jax:     max={dl.max():.3e} final={dl[-1]:.3e}")
    print(f"per-step |dloss| torch-vs-control: max={dc.max():.3e} final={dc[-1]:.3e}")
    for i in (0, 1, 2, 5, 10, 20, N_STEPS // 2, N_STEPS - 1):
        print(
            f"  step {i:3d}: torch {tl[i]:.10f}  jax |d|={dl[i]:.3e}  "
            f"control |d|={dc[i]:.3e}"
        )

    dsed = np.abs(tsed - jsed)
    ddoa = np.abs(tdoa - jdoa)
    print(f"trained-model eval outputs: max|dSED|={dsed.max():.3e} max|dDOA|={ddoa.max():.3e}")

    row_t = metric_row(tsed, tdoa, yt, cfg)
    row_j = metric_row(jsed, jdoa, yt, cfg)
    row_c = metric_row(csed, cdoa, yt, cfg)
    print(f"metric row torch:   {row_t}")
    print(f"metric row jax:     {row_j}")
    print(f"metric row control: {row_c}")
    same_counts = row_t[:3] == row_j[:3]
    same_row = row_t == row_j
    # the pass condition: either exact metric-count agreement, or the
    # jax divergence sits within ~3x the torch reference's own
    # rounding-perturbation envelope at every step (chaos, not a bug)
    envelope_ok = bool(np.all(dl <= 3.0 * np.maximum(dc, 1e-12) + 1e-9))
    print(
        f"TRAIN-EQUIVALENCE: counts_equal={same_counts} row_equal={same_row} "
        f"within_control_envelope={envelope_ok} "
        f"max_step_dloss={dl.max():.3e} max_eval_dout={max(dsed.max(), ddoa.max()):.3e}"
    )
    if not (same_counts or envelope_ok):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
