"""Model zoo tests: shapes, model-name/RF synthesis, chunked attention, and
full-model weight-import parity vs the torch mirror (<=1e-5)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from seld_tpu.models import SELDModel, receptive_field, synthesize_model_name
from seld_tpu.models.attention import MultiHeadAttention
from seld_tpu.utils.torch_import import import_reference_state_dict

from tests.torch_seld import SELDModelT

TINY = dict(
    freq=32, time=32, pool=((2, 2), (2, 2), (2, 2)), filters=(8, 8, 8),
    G=16, U=16, V=(16, 16), fc=(16,), D=(3,),
)


def _tiny_model(domain, cin, domain_classifier="same", bn="BN", parallel="False",
                magphase=False, fc_dropout="Last"):
    return SELDModel(
        time_dim=TINY["time"], freq_dim=TINY["freq"], input_channels=cin,
        output_classes=14, domain=domain, domain_classifier=domain_classifier,
        cnn_filters=TINY["filters"], pool_size=TINY["pool"], pool_time="TCN",
        D=TINY["D"], dilation_mode="fibonacci", G=TINY["G"], U=TINY["U"],
        spatial_dropout_rate=0.5, V=TINY["V"], fc_layers=TINY["fc"],
        fc_dropout=fc_dropout, dropout_perc=0.3, class_overlaps=3,
        use_bias_conv=False, use_bias_linear=True, batch_norm=bn,
        parallel_ConvTC_block=parallel, parallel_magphase=magphase,
        attention_impl="full",
    )


@pytest.mark.parametrize("domain,cin", [("R", 8), ("Q", 8), ("DQ", 8)])
def test_forward_shapes(rng, domain, cin):
    model = _tiny_model(domain, cin)
    x = jnp.asarray(rng.standard_normal((2, cin, TINY["freq"], TINY["time"])).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed, doa = model.apply(variables, x, train=False)
    assert sed.shape == (2, 4, 42)  # time 32 -> /2/2/2 = 4
    assert doa.shape == (2, 4, 126)
    assert float(jnp.max(sed)) <= 1.0 and float(jnp.min(sed)) >= 0.0
    assert float(jnp.max(jnp.abs(doa))) <= 1.0


def test_train_mode_runs(rng):
    model = _tiny_model("Q", 8)
    x = jnp.asarray(rng.standard_normal((2, 8, TINY["freq"], TINY["time"])).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (sed, doa), updates = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in updates
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert float(jnp.abs(leaf).sum()) > 0


def test_model_name_and_receptive_field():
    # reference: D=[10], k=3, fibonacci -> RF 287, 10 resblocks (SURVEY.md §2.3)
    rf, n = receptive_field([10], 3, "fibonacci")
    assert (rf, n) == (287, 10)
    name = synthesize_model_name("DQ", "fibonacci", [10], "False", "BN", "TCN", rf, n)
    assert name == "DualQSELD-TCN-PHI-S1_BN_RF287_10RB"
    name_q = synthesize_model_name("Q", "fibonacci", [10], "2Parallel", "BN", "TCN", rf, n)
    assert name_q == "QSELD-TCN-PHI-S1_2Parallel_BN_RF287_10RB"
    rf2, n2 = receptive_field([5, 5], 3, "exp")
    assert n2 == 10 and rf2 == 1 + 2 * 2 * (1 + 2 + 4 + 8 + 16)


def test_chunked_attention_matches_full(rng):
    e, t = 16, 40
    x = jnp.asarray(rng.standard_normal((2, t, e)).astype(np.float32))
    full = MultiHeadAttention(embed_size=e, num_heads=8, impl="full")
    chunked = MultiHeadAttention(embed_size=e, num_heads=8, impl="chunked", chunk_size=16)
    v = full.init(jax.random.PRNGKey(0), x, x, x)
    out_f = full.apply(v, x, x, x)
    out_c = chunked.apply(v, x, x, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c), atol=1e-5)


def _parity_case(rng, domain, cin, domain_classifier="same", parallel=False, magphase=False):
    """Build torch mirror + flax model, import weights, compare eval outputs."""
    t = TINY
    tm = SELDModelT(
        freq=t["freq"], cin=cin, domain=domain, domain_classifier=domain_classifier,
        filters=list(t["filters"]), pool=[list(p) for p in t["pool"]], G=t["G"],
        U=t["U"], V=list(t["V"]), vk=3, dilations=[1, 1, 2], fc_layers=list(t["fc"]),
        bias_conv=False, bias_linear=True, bn="BN",
        parallel=parallel, magphase=magphase,
    )
    # move BN running stats off their init values, then freeze
    tm.train()
    with torch.no_grad():
        for _ in range(3):
            tm(torch.randn(4, cin, t["freq"], t["time"]))
    tm.eval()

    x = rng.standard_normal((2, cin, t["freq"], t["time"])).astype(np.float32)
    with torch.no_grad():
        sed_ref, doa_ref = tm(torch.tensor(x))

    fm = _tiny_model(
        domain, cin, domain_classifier=domain_classifier,
        parallel="2Parallel" if parallel else "False", magphase=magphase,
    )
    variables = import_reference_state_dict(tm.state_dict())
    sed, doa = fm.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    # per-op parity is pinned at 1e-5 (test_quaternion_ops / test_pallas) and
    # head-with-imported-weights parity at ~1e-6; end-to-end, XLA-vs-torch
    # f32 reduction-order differences accumulate layer by layer (bisection:
    # conv0 exact -> conv2 2e-5 -> trunk 4e-5, amplified by BN rescaling and
    # tanh'(0)=1 on the DOA head), so the full-model gate is 5e-4.
    np.testing.assert_allclose(np.asarray(sed), sed_ref.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(doa), doa_ref.numpy(), atol=5e-4)


@pytest.mark.parametrize("domain,cin", [("R", 8), ("Q", 8), ("DQ", 8)])
def test_full_model_parity(rng, domain, cin):
    torch.manual_seed(0)
    _parity_case(rng, domain, cin)


def test_full_model_parity_parallel_magphase(rng):
    torch.manual_seed(1)
    _parity_case(rng, "DQ", 16, domain_classifier="R", parallel=True, magphase=True)


def test_se_block_optional(rng):
    model = SELDModel(
        time_dim=TINY["time"], freq_dim=TINY["freq"], input_channels=8,
        domain="R", cnn_filters=TINY["filters"], pool_size=TINY["pool"],
        D=TINY["D"], G=16, U=16, V=TINY["V"], fc_layers=TINY["fc"],
        use_se_block=True, attention_impl="full",
    )
    x = jnp.asarray(rng.standard_normal((1, 8, TINY["freq"], TINY["time"])).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed, doa = model.apply(variables, x, train=False)
    assert sed.shape[-1] == 42
    assert any("se_" in k for k in variables["params"]["seld_block"])


def test_bfloat16_compute_close_to_f32(rng):
    """The serving dtype must track the f32 path closely (outputs are f32)."""
    import dataclasses

    model = _tiny_model("Q", 8)
    model_bf16 = dataclasses.replace(model, compute_dtype="bfloat16")
    x = jnp.asarray(rng.standard_normal((2, 8, TINY["freq"], TINY["time"])).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed32, doa32 = model.apply(variables, x, train=False)
    sed16, doa16 = model_bf16.apply(variables, x, train=False)
    assert sed16.dtype == jnp.float32 and doa16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(sed16 - sed32))) < 0.05
    assert float(jnp.max(jnp.abs(doa16 - doa32))) < 0.1


def test_hamilton_transpose_conv_layer(rng):
    """Layer-level transpose conv matches the op-level result."""
    from seld_tpu.models.transpose_conv import HamiltonTransposeConv
    from seld_tpu.ops import quaternion_transpose_conv

    layer = HamiltonTransposeConv(features=8, kernel_size=3, ndim=1, stride=2, padding=1)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    ref = quaternion_transpose_conv(
        x, variables["params"]["w"], variables["params"]["b"],
        stride=2, padding=1, output_padding=0,
    )
    assert out.shape == (2, 19, 8)  # (10-1)*2 - 2*1 + 3 = 19
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pool_time_cnn_parity(rng):
    """pool_time='CNN': pooling happens in the front-end, TCN keeps time.

    Covers reference model.py:252-267 (CNN pools [p_f, p_t]; TC_Block skips
    its three time pools)."""
    torch.manual_seed(3)
    t = TINY
    tm = SELDModelT(
        freq=t["freq"], cin=8, domain="R", domain_classifier="same",
        filters=list(t["filters"]), pool=[list(p) for p in t["pool"]], G=t["G"],
        U=t["U"], V=list(t["V"]), vk=3, dilations=[1, 1, 2],
        fc_layers=list(t["fc"]), bias_conv=False, bias_linear=True, bn="BN",
        pool_time="CNN",
    )
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(4, 8, t["freq"], t["time"]))
    tm.eval()
    x = rng.standard_normal((2, 8, t["freq"], t["time"])).astype(np.float32)
    with torch.no_grad():
        sed_ref, doa_ref = tm(torch.tensor(x))

    fm = SELDModel(
        time_dim=t["time"], freq_dim=t["freq"], input_channels=8,
        output_classes=14, domain="R", cnn_filters=t["filters"],
        pool_size=t["pool"], pool_time="CNN", D=t["D"],
        dilation_mode="fibonacci", G=t["G"], U=t["U"], V=t["V"],
        fc_layers=t["fc"], class_overlaps=3, use_bias_conv=False,
        batch_norm="BN", attention_impl="full",
    )
    variables = import_reference_state_dict(tm.state_dict())
    sed, doa = fm.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    assert sed.shape == sed_ref.shape == (2, 4, 42)  # 32 / (2*2*2)
    np.testing.assert_allclose(np.asarray(sed), sed_ref.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(doa), doa_ref.numpy(), atol=5e-4)


def test_multi_stack_model(rng):
    """Multi-stack D=[2,3] with exponential dilations forward-checks."""
    model = SELDModel(
        time_dim=TINY["time"], freq_dim=TINY["freq"], input_channels=8,
        domain="Q", cnn_filters=TINY["filters"], pool_size=TINY["pool"],
        pool_time="TCN", D=(2, 3), dilation_mode="exp", G=16, U=16,
        V=TINY["V"], fc_layers=TINY["fc"], attention_impl="full",
    )
    assert "I" in model.model_name and "S2" in model.model_name
    x = jnp.asarray(rng.standard_normal((1, 8, TINY["freq"], TINY["time"])).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed, doa = model.apply(variables, x, train=False)
    assert sed.shape == (1, 4, 42)
    # 2+3 resblocks exist
    assert "resblock_4" in variables["params"]["seld_block"]["tcn"]


def test_banded_frontend_matches_direct(rng):
    """frontend_bands>1 must be output-identical to the direct front-end."""
    from seld_tpu.models.blocks import ConvTCBlock

    kw = dict(
        domain="Q", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), batch_norm="BN",
        use_bias=False, attention_impl="full",
    )
    direct = ConvTCBlock(**kw)
    banded = ConvTCBlock(frontend_bands=4, **kw)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    variables = direct.init(jax.random.PRNGKey(0), x, train=False)
    out_d = direct.apply(variables, x, train=False)
    out_b = banded.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), atol=1e-5)


def test_banded_frontend_train_matches_direct(rng):
    """TRAIN-mode banded stage (_BandedTrainStage two-phase scan) must match
    the direct stage: forward output, updated batch_stats AND gradients
    (dropout off so train=True is deterministic)."""
    from seld_tpu.models.blocks import ConvTCBlock

    kw = dict(
        domain="Q", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), batch_norm="BN",
        use_bias=False, attention_impl="full", dropout_perc=0.0,
        spatial_dropout_rate=0.0,
    )
    direct = ConvTCBlock(**kw)
    banded = ConvTCBlock(frontend_bands=4, **kw)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    variables = direct.init(jax.random.PRNGKey(0), x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    def run(model):
        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"], rngs=rngs,
            )
            return jnp.sum(out * out), (out, upd["batch_stats"])

        (loss, (out, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        return out, stats, grads

    out_d, stats_d, grads_d = run(direct)
    out_b, stats_b, grads_b = run(banded)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        stats_b, stats_d,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-4
        ),
        grads_b, grads_d,
    )


@pytest.mark.parametrize("domain,impl", [
    ("Q", "pallas-interpret"), ("R", "pallas-interpret"),
    ("Q", "pallas-interpret-thin"),
])
def test_fused_train_frontend_matches_direct(rng, domain, impl):
    """TRAIN-mode fused Pallas stage 1 (ops/pallas/conv2d_train.py via
    frontend_impl='pallas-interpret') must match the direct stage: forward
    output, updated batch_stats AND parameter gradients (stage-1's input
    carries no gradient in either path — it is the data)."""
    from seld_tpu.models.blocks import ConvTCBlock

    kw = dict(
        domain=domain, cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), batch_norm="BN",
        use_bias=False, attention_impl="full", dropout_perc=0.0,
        spatial_dropout_rate=0.0,
    )
    direct = ConvTCBlock(frontend_impl="xla", **kw)
    fused = ConvTCBlock(frontend_impl=impl, **kw)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    variables = direct.init(jax.random.PRNGKey(0), x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    def run(model):
        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"], rngs=rngs,
            )
            return jnp.sum(out * out), (out, upd["batch_stats"])

        (loss, (out, stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        return out, stats, grads

    out_d, stats_d, grads_d = run(direct)
    out_f, stats_f, grads_f = run(fused)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d), atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        stats_f, stats_d,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-4
        ),
        grads_f, grads_d,
    )


def test_fused_train_frontend_auto_is_xla_on_cpu(rng):
    """frontend_impl='auto' must resolve to the XLA stage off-TPU (the
    Pallas kernel only lowers on real TPU hardware)."""
    from seld_tpu.models.blocks import ConvTCBlock

    model = ConvTCBlock(
        domain="Q", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), batch_norm="BN",
        use_bias=False, attention_impl="full",
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )[0]
    assert out.shape[0] == 2  # ran through the XLA path without Pallas


def test_fc_relu_head_parity(rng):
    """fc_activations='relu' head variant (reference model.py:442-444)."""
    torch.manual_seed(5)
    t = TINY
    tm = SELDModelT(
        freq=t["freq"], cin=8, domain="Q", domain_classifier="R",
        filters=list(t["filters"]), pool=[list(p) for p in t["pool"]], G=t["G"],
        U=t["U"], V=list(t["V"]), vk=3, dilations=[1, 1, 2],
        fc_layers=list(t["fc"]), bias_conv=False, bias_linear=True, bn="BN",
        fc_activations="relu",
    )
    tm.train()
    with torch.no_grad():
        tm(torch.randn(4, 8, t["freq"], t["time"]))
    tm.eval()
    x = rng.standard_normal((2, 8, t["freq"], t["time"])).astype(np.float32)
    with torch.no_grad():
        sed_ref, doa_ref = tm(torch.tensor(x))
    fm = SELDModel(
        time_dim=t["time"], freq_dim=t["freq"], input_channels=8,
        output_classes=14, domain="Q", domain_classifier="R",
        cnn_filters=t["filters"], pool_size=t["pool"], pool_time="TCN",
        D=t["D"], G=t["G"], U=t["U"], V=t["V"], fc_layers=t["fc"],
        fc_activations="relu", class_overlaps=3, use_bias_conv=False,
        batch_norm="BN", attention_impl="full",
    )
    variables = import_reference_state_dict(tm.state_dict())
    sed, doa = fm.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(sed), sed_ref.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(doa), doa_ref.numpy(), atol=5e-4)


@pytest.mark.parametrize("ndim", [1, 2])
def test_depthwise_separable_conv_parity(rng, ndim):
    """DepthwiseSeparableConv vs a torch depthwise+pointwise+BN+ReLU oracle
    (reference dual_quaternion_layers.py:19-47), eval-mode BN."""
    from seld_tpu.models.layers import DepthwiseSeparableConv

    cin, cout, k = 6, 10, 3
    if ndim == 1:
        tm = torch.nn.Sequential(
            torch.nn.Conv1d(cin, cin, k, 1, 1, groups=cin),
            torch.nn.Conv1d(cin, cout, 1),
            torch.nn.BatchNorm1d(cout),
            torch.nn.ReLU(),
        )
        x = rng.standard_normal((2, cin, 16)).astype(np.float32)
        x_cl = np.transpose(x, (0, 2, 1))  # (B, T, C)
        perm_w = (2, 1, 0)  # torch (cout, cin/groups, k) -> (k, cin/g, cout)
    else:
        tm = torch.nn.Sequential(
            torch.nn.Conv2d(cin, cin, k, 1, 1, groups=cin),
            torch.nn.Conv2d(cin, cout, 1),
            torch.nn.BatchNorm2d(cout),
            torch.nn.ReLU(),
        )
        x = rng.standard_normal((2, cin, 12, 16)).astype(np.float32)
        x_cl = np.transpose(x, (0, 2, 3, 1))  # (B, H, W, C)
        perm_w = (2, 3, 1, 0)
    tm.train()
    with torch.no_grad():
        tm(torch.tensor(x))
    tm.eval()
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()

    m = DepthwiseSeparableConv(features=cout, kernel_size=k, ndim=ndim, padding=1)
    params = {
        "dw": np.transpose(tm[0].weight.detach().numpy(), perm_w),
        "dw_b": tm[0].bias.detach().numpy(),
        "pw": np.transpose(tm[1].weight.detach().numpy(), perm_w),
        "pw_b": tm[1].bias.detach().numpy(),
        "BatchNorm_0": {
            "scale": tm[2].weight.detach().numpy(),
            "bias": tm[2].bias.detach().numpy(),
        },
    }
    stats = {
        "BatchNorm_0": {
            "mean": tm[2].running_mean.numpy(),
            "var": tm[2].running_var.numpy(),
        }
    }
    got = m.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_cl), train=False
    )
    axes = (0, 2, 1) if ndim == 1 else (0, 3, 1, 2)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), axes), want, atol=1e-5
    )
