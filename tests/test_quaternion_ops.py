"""Parity tests: seld_tpu quaternion/DQ ops vs the torch CPU oracle (<=1e-5)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seld_tpu.ops import (
    dual_quaternion_conv,
    dual_quaternion_linear,
    hamilton_product,
    q_normalize,
    quaternion_conv,
    quaternion_linear,
    quaternion_transpose_conv,
)
from seld_tpu.ops.inits import component_init
import jax

from tests import torch_oracle as oracle


def _mk_comps(rng, n, cin, cout, *kernel):
    """Random components in torch layout (n, out, in, *k) and ours (n, *k, in, out)."""
    t = rng.standard_normal((n, cout, cin, *kernel)).astype(np.float32)
    axes = (0,) + tuple(range(3, 3 + len(kernel))) + (2, 1)
    ours = np.transpose(t, axes)
    return t, ours


def _mk_lin_comps(rng, n, cin, cout):
    t = rng.standard_normal((n, cin, cout)).astype(np.float32)
    return t, t  # linear layout (in, out) matches


@pytest.mark.parametrize("dilation", [1, 3])
@pytest.mark.parametrize("bias", [False, True])
def test_q_conv1d_parity(rng, dilation, bias):
    B, Cin, Cout, T, k = 2, 8, 16, 50, 3
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    tcomps, ours = _mk_comps(rng, 4, Cin // 4, Cout // 4, k)
    b = rng.standard_normal(Cout).astype(np.float32) if bias else None
    pad = ((k - 1) * dilation) // 2
    ref = oracle.oracle_q_conv(
        torch.tensor(x), [torch.tensor(c) for c in tcomps],
        torch.tensor(b) if bias else None, 1, pad, dilation,
    ).numpy()
    got = quaternion_conv(
        jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(ours),
        jnp.asarray(b) if bias else None, stride=1, padding=pad, dilation=dilation,
    )
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 1)), ref, atol=1e-5)


def test_q_conv2d_parity(rng):
    B, Cin, Cout, H, W, k = 2, 4, 8, 12, 10, 3
    x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
    tcomps, ours = _mk_comps(rng, 4, Cin // 4, Cout // 4, k, k)
    ref = oracle.oracle_q_conv(
        torch.tensor(x), [torch.tensor(c) for c in tcomps], None, 1, 1, 1
    ).numpy()
    got = quaternion_conv(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(ours), None, padding=1
    )
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=1e-5)


def test_dq_conv1d_parity(rng):
    B, Cin, Cout, T, k = 2, 8, 16, 40, 3
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    tcomps, ours = _mk_comps(rng, 8, Cin // 8, Cout // 8, k)
    ref = oracle.oracle_dq_conv(
        torch.tensor(x), [torch.tensor(c) for c in tcomps], None, 1, 1, 1
    ).numpy()
    got = dual_quaternion_conv(
        jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(ours), None, padding=1
    )
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 1)), ref, atol=1e-5)


def test_dq_conv2d_parity(rng):
    B, Cin, Cout, H, W, k = 1, 8, 8, 9, 11, 3
    x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
    tcomps, ours = _mk_comps(rng, 8, Cin // 8, Cout // 8, k, k)
    ref = oracle.oracle_dq_conv(
        torch.tensor(x), [torch.tensor(c) for c in tcomps], None, 1, 1, 1
    ).numpy()
    got = dual_quaternion_conv(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(ours), None, padding=1
    )
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=1e-5)


@pytest.mark.parametrize("bias", [False, True])
def test_q_linear_parity(rng, bias):
    B, Cin, Cout = 6, 16, 8
    x = rng.standard_normal((B, Cin)).astype(np.float32)
    tcomps, ours = _mk_lin_comps(rng, 4, Cin // 4, Cout // 4)
    b = rng.standard_normal(Cout).astype(np.float32) if bias else None
    ref = oracle.oracle_q_linear(
        torch.tensor(x), [torch.tensor(c) for c in tcomps], torch.tensor(b) if bias else None
    ).numpy()
    got = quaternion_linear(jnp.asarray(x), jnp.asarray(ours), jnp.asarray(b) if bias else None)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_dq_linear_parity_transposed_table(rng):
    """The DQ linear must reproduce the reference's swapped-cat-dims quirk."""
    B, Cin, Cout = 5, 16, 24
    x = rng.standard_normal((B, Cin)).astype(np.float32)
    tcomps, ours = _mk_lin_comps(rng, 8, Cin // 8, Cout // 8)
    ref = oracle.oracle_dq_linear(torch.tensor(x), [torch.tensor(c) for c in tcomps]).numpy()
    got = dual_quaternion_linear(jnp.asarray(x), jnp.asarray(ours))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
    # and it must NOT equal the conv-orientation construction (quirk is real)
    conv_w = oracle.dq_conv_weight(
        [torch.tensor(c).T for c in tcomps[:4]],
        [torch.tensor(c).T for c in tcomps[4:]],
    )
    alt = (torch.tensor(x) @ conv_w.T).numpy()
    assert np.abs(alt - ref).max() > 1e-3


def test_q_transpose_conv_parity(rng):
    B, Cin, Cout, T, k, stride = 2, 8, 4, 20, 3, 2
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    tcomps, ours = _mk_comps(rng, 4, Cout // 4, Cin // 4, k)  # transpose conv: (in, out, k)
    w = oracle.q_conv_weight(*[torch.tensor(c) for c in tcomps])
    ref = torch.nn.functional.conv_transpose1d(torch.tensor(x), w, None, stride, 1, 0).numpy()
    # torch transpose-conv weight is (in, out, k); ours wants (4, k, in/4, out/4)
    ours_t = np.transpose(
        np.stack([c for c in tcomps]), (0, 3, 1, 2)
    )
    got = quaternion_transpose_conv(
        jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(ours_t), None,
        stride=stride, padding=1, output_padding=0,
    )
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 1)), ref, atol=1e-5)


def test_hamilton_product_identity(rng):
    x = rng.standard_normal((3, 8)).astype(np.float32)
    # identity quaternion (1, 0, 0, 0) per lane
    e = np.zeros((3, 8), np.float32)
    e[:, 0:2] = 1.0
    out = hamilton_product(jnp.asarray(e), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_q_normalize_unit(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    out = np.asarray(q_normalize(jnp.asarray(x)))
    r, i, j, k = np.split(out, 4, axis=-1)
    np.testing.assert_allclose(r * r + i * i + j * j + k * k, 1.0, atol=1e-3)


def test_component_init_stats():
    key = jax.random.PRNGKey(0)
    w = component_init(key, (3, 64, 64), n_components=4, weight_init="quaternion")
    assert w.shape == (4, 3, 64, 64)
    s = 1.0 / np.sqrt(2 * (64 * 3 + 64 * 3))
    # modulus uniform in (-s, s) -> component std below s
    assert float(jnp.abs(w).max()) <= s + 1e-6
    w8 = component_init(key, (16, 16), n_components=8)
    assert w8.shape == (8, 16, 16)
    assert float(jnp.std(w8[:4])) > 0 and float(jnp.std(w8[4:])) > 0


def test_gradients_flow(rng):
    """Autodiff through the assembled weight yields usable component grads."""
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    comps = jnp.asarray(rng.standard_normal((4, 3, 2, 4)).astype(np.float32))

    def loss(c):
        return jnp.sum(quaternion_conv(x, c, None, padding=1) ** 2)

    g = jax.grad(loss)(comps)
    assert g.shape == comps.shape
    assert float(jnp.abs(g).sum()) > 0


def test_quaternion_rotation_kernel_matches_torch_formula(rng):
    """Rotation kernel R (linear orientation) vs the documented W*x*W† form
    (reference quaternion_ops.py:330-388)."""
    from seld_tpu.ops import quaternion_rotation_kernel

    comps = rng.standard_normal((4, 2, 3)).astype(np.float32)
    r, i, j, k = [torch.tensor(c) for c in comps]
    norm_factor = 2.0 * torch.sqrt(r * r + i * i + j * j + k * k)
    sq_i, sq_j, sq_k = norm_factor * i * i, norm_factor * j * j, norm_factor * k * k
    ri, rj, rk = norm_factor * r * i, norm_factor * r * j, norm_factor * r * k
    ij, ik, jk = norm_factor * i * j, norm_factor * i * k, norm_factor * j * k
    col1 = torch.cat((1.0 - (sq_j + sq_k), ij - rk, ik + rj), dim=0)
    col2 = torch.cat((ij + rk, 1.0 - (sq_i + sq_k), jk - ri), dim=0)
    col3 = torch.cat((ik - rj, jk + ri, 1.0 - (sq_i + sq_j)), dim=0)
    ref = torch.cat((col1, col2, col3), dim=1).numpy()
    got = np.asarray(quaternion_rotation_kernel(jnp.asarray(comps)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_quaternion_exp_of_zero_is_identity():
    from seld_tpu.ops import quaternion_exp

    x = jnp.zeros((2, 8))
    out = np.asarray(quaternion_exp(x))
    np.testing.assert_allclose(out[:, 0:2], 1.0, atol=1e-3)  # cos(|v|~0)*e^0
    np.testing.assert_allclose(out[:, 2:], 0.0, atol=1e-3)


def test_get_normalized_unit_modulus(rng):
    from seld_tpu.ops import get_modulus, get_normalized

    x = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32) * 3)
    out = get_normalized(x)
    mod = np.asarray(get_modulus(out, vector_form=True))
    np.testing.assert_allclose(mod, 1.0, atol=1e-3)


def _torch_rot_kernel(comps_t, quaternion_format, cat_dim0, cat_dim1):
    """Reference-style rotation kernel via torch.cat (quaternion_ops.py:174-233,
    330-388): cat component blocks along dim 0 within each rot_kernel and the
    rot_kernels along dim 1 (the reference uses dims (0, 1) for all three
    weight layouts)."""
    r, i, j, k = [torch.tensor(c) for c in comps_t]
    norm_factor = 2.0 * torch.sqrt(r * r + i * i + j * j + k * k)
    sq_i, sq_j, sq_k = norm_factor * i * i, norm_factor * j * j, norm_factor * k * k
    ri, rj, rk = norm_factor * r * i, norm_factor * r * j, norm_factor * r * k
    ij, ik, jk = norm_factor * i * j, norm_factor * i * k, norm_factor * j * k
    rot1 = [1.0 - (sq_j + sq_k), ij - rk, ik + rj]
    rot2 = [ij + rk, 1.0 - (sq_i + sq_k), jk - ri]
    rot3 = [ik - rj, jk + ri, 1.0 - (sq_i + sq_j)]
    if quaternion_format:
        zero = torch.zeros_like(r)
        rots = [
            torch.cat([zero] + rot, dim=cat_dim0) for rot in (rot1, rot2, rot3)
        ]
        zero2 = torch.zeros_like(rots[0])
        return torch.cat([zero2] + rots, dim=cat_dim1)
    rots = [torch.cat(rot, dim=cat_dim0) for rot in (rot1, rot2, rot3)]
    return torch.cat(rots, dim=cat_dim1)


@pytest.mark.parametrize("qf", [False, True])
def test_q_conv_rotation_parity(rng, qf):
    """quaternion_conv_rotation vs torch F.conv1d with the reference kernel
    (reference quaternion_ops.py:174-233; torch weight layout (out, in, k):
    cat dim 0 stacks output blocks, dim 1 input blocks)."""
    from seld_tpu.ops import quaternion_conv_rotation

    cin_b, cout_b, B, T, k = 3, 5, 2, 20, 3
    blocks = 4 if qf else 3
    comps_t = rng.standard_normal((4, cout_b, cin_b, k)).astype(np.float32)
    w_torch = _torch_rot_kernel(comps_t, qf, cat_dim0=0, cat_dim1=1)
    x = rng.standard_normal((B, blocks * cin_b, T)).astype(np.float32)
    want = torch.nn.functional.conv1d(
        torch.tensor(x), w_torch, None, 1, 1
    ).numpy()

    comps_ours = np.transpose(comps_t, (0, 3, 2, 1))  # (4, k, in, out)
    got = np.asarray(
        quaternion_conv_rotation(
            jnp.asarray(np.transpose(x, (0, 2, 1))),
            jnp.asarray(comps_ours),
            padding=1,
            quaternion_format=qf,
        )
    )
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want, atol=1e-5)


@pytest.mark.parametrize("qf", [False, True])
def test_q_linear_rotation_parity(rng, qf):
    """quaternion_linear_rotation vs torch.mm with the reference kernel
    (reference quaternion_ops.py:330-388; weight layout (in, out))."""
    from seld_tpu.ops import quaternion_linear_rotation

    cin_b, cout_b, B = 3, 5, 6
    blocks = 4 if qf else 3
    comps_t = rng.standard_normal((4, cin_b, cout_b)).astype(np.float32)
    w_torch = _torch_rot_kernel(comps_t, qf, cat_dim0=0, cat_dim1=1)
    x = rng.standard_normal((B, blocks * cin_b)).astype(np.float32)
    bias = rng.standard_normal((blocks * cout_b,)).astype(np.float32)
    want = torch.addmm(torch.tensor(bias), torch.tensor(x), w_torch).numpy()
    got = np.asarray(
        quaternion_linear_rotation(
            jnp.asarray(x), jnp.asarray(comps_t), jnp.asarray(bias), quaternion_format=qf
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("qf", [False, True])
def test_q_transpose_conv_rotation_parity(rng, qf):
    """quaternion_transpose_conv_rotation vs torch F.conv_transpose1d
    (reference quaternion_ops.py:237-295; conv_transpose weight layout
    (in, out, k): cat dim 0 stacks input blocks, dim 1 output blocks)."""
    from seld_tpu.ops import quaternion_transpose_conv_rotation

    cin_b, cout_b, B, T, k = 3, 5, 2, 10, 3
    blocks = 4 if qf else 3
    comps_t = rng.standard_normal((4, cin_b, cout_b, k)).astype(np.float32)
    w_torch = _torch_rot_kernel(comps_t, qf, cat_dim0=0, cat_dim1=1)
    x = rng.standard_normal((B, blocks * cin_b, T)).astype(np.float32)
    want = torch.nn.functional.conv_transpose1d(
        torch.tensor(x), w_torch, None, 2, 1, 1
    ).numpy()

    comps_ours = np.transpose(comps_t, (0, 3, 1, 2))  # (4, k, in, out)
    got = np.asarray(
        quaternion_transpose_conv_rotation(
            jnp.asarray(np.transpose(x, (0, 2, 1))),
            jnp.asarray(comps_ours),
            stride=2,
            padding=1,
            output_padding=1,
            quaternion_format=qf,
        )
    )
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), want, atol=1e-5)


@pytest.mark.parametrize("layer_kind", ["conv", "linear"])
def test_hamilton_layer_rotation_flag(rng, layer_kind):
    """HamiltonConv/HamiltonLinear rotation= flag builds and runs, and the
    non-quaternion_format output width is 3/4 of the nominal features."""
    from seld_tpu.models.layers import HamiltonConv, HamiltonLinear

    if layer_kind == "conv":
        layer = HamiltonConv(16, 3, ndim=1, padding=1, rotation=True)
        x = jnp.asarray(rng.standard_normal((2, 10, 12)).astype(np.float32))
    else:
        layer = HamiltonLinear(16, rotation=True)
        x = jnp.asarray(rng.standard_normal((2, 12)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape[-1] == 12  # 3 * (16 // 4)


def test_q_normalize_and_exp_torch_oracle(rng):
    """q_normalize / quaternion_exp vs the reference formulas executed in
    torch (reference dual_quaternion_ops.py:206-243), incl. the exp's
    ADDITIVE 1e-4 epsilon quirk."""
    from seld_tpu.ops import q_normalize, quaternion_exp

    x = rng.standard_normal((5, 16)).astype(np.float32)
    tx = torch.tensor(x)
    r, i, j, k = tx.chunk(4, dim=1)

    norm = torch.sqrt(r * r + i * i + j * j + k * k + 0.0001)
    want_norm = torch.cat([r / norm, i / norm, j / norm, k / norm], dim=1).numpy()
    np.testing.assert_allclose(
        np.asarray(q_normalize(jnp.asarray(x))), want_norm, atol=1e-6
    )

    nv = torch.sqrt(i * i + j * j + k * k) + 0.0001
    er = torch.exp(r)
    want_exp = torch.cat(
        [er * torch.cos(nv), er * (i / nv) * torch.sin(nv),
         er * (j / nv) * torch.sin(nv), er * (k / nv) * torch.sin(nv)], dim=1
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(quaternion_exp(jnp.asarray(x))), want_exp, atol=1e-6
    )
