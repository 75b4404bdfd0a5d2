"""Pallas fused res-chain kernel: correctness vs the plain-XLA reference
(interpret mode on CPU; the real Mosaic lowering is exercised on TPU by
bench.py and the inference pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.kernels.res_block import (
    chain_weights_from_folded,
    fused_res_chain,
)


def xla_res(x, w1, b1, w2, b2, w3, b3):
    h1 = jax.nn.relu(jnp.einsum("bhwc,ci->bhwi", x, w1) + b1)
    k = w2[..., None, :]
    h2 = jax.lax.conv_general_dilated(
        h1, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h1.shape[-1],
    )
    h2 = jax.nn.relu(h2 + b2)
    return x + jnp.einsum("bhwi,ic->bhwc", h2, w3) + b3


@pytest.mark.parametrize("shape", [
    (2, 1, 16, 20, 8, 32),   # (B, K, H, W, C, I)
    (3, 2, 8, 10, 4, 8),
    (2, 3, 8, 12, 16, 48),
])
def test_fused_chain_matches_xla(shape):
    b, k, h, w, c, i = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.5, jnp.float32)
    st = (
        jnp.asarray(rng.standard_normal((k, c, i)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((k, i)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((k, 3, 3, i)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((k, i)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((k, i, c)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((k, c)) * 0.1, jnp.float32),
    )
    ref = x
    for j in range(k):
        ref = xla_res(ref, st[0][j], st[1][j], st[2][j], st[3][j], st[4][j], st[5][j])
    got = fused_res_chain(x, *st, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [
    (2, 2, 8, 10, 48, 224),
    (4, 1, 16, 20, 24, 136),
])
def test_fused_chain_rows_matches_xla(shape):
    from yolofastest_tpu.kernels.res_block import fused_res_chain_nhwc

    b, k, h, w, c, i = shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.5, jnp.float32)
    st = (
        jnp.asarray(rng.standard_normal((k, c, i)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((k, i)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((k, 3, 3, i)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((k, i)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((k, i, c)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((k, c)) * 0.1, jnp.float32),
    )
    ref = x
    for j in range(k):
        ref = xla_res(ref, st[0][j], st[1][j], st[2][j], st[3][j], st[4][j], st[5][j])
    got = fused_res_chain_nhwc(x, *st, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_chain_weights_from_folded_shapes():
    c, i = 8, 32
    folded = {}
    for name in ("res2_1", "res2_2"):
        folded[f"{name}/conv1"] = {"kernel": np.zeros((1, 1, c, i), np.float32),
                                   "bias": np.zeros(i, np.float32)}
        folded[f"{name}/conv2"] = {"kernel": np.zeros((3, 3, 1, i), np.float32),
                                   "bias": np.zeros(i, np.float32)}
        folded[f"{name}/conv3"] = {"kernel": np.zeros((1, 1, i, c), np.float32),
                                   "bias": np.zeros(c, np.float32)}
    w1, b1, w2, b2, w3, b3 = chain_weights_from_folded(folded, ["res2_1", "res2_2"])
    assert w1.shape == (2, c, i) and w2.shape == (2, 3, 3, i) and w3.shape == (2, i, c)
    assert b1.shape == (2, i) and b2.shape == (2, i) and b3.shape == (2, c)
