"""Fused disparity head (ops/pallas_disp.py) vs the decoder's XLA chain:
forward values and all three gradients, including fully-masked pixels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.ops.pallas_disp import disp_head

pytestmark = pytest.mark.heavy

B, H, W, N = 2, 8, 64, 6
RNG = np.random.default_rng(23)


def xla_chain(logits, sigma, disp_rows, mask_rows):
    """The decoder's reference composition (models/depth_decoder.py:199-217):
    softmax -> w = p*m/s -> guarded renorm -> contraction with d."""
    p = jax.nn.softmax(logits, axis=-1)
    m = mask_rows[:, :, None, :]
    w = p * m / sigma
    s = jnp.sum(w, axis=-1, keepdims=True)
    inv = jnp.where(s > 1e-7, 1.0 / jnp.maximum(s, 1e-7), 0.0)
    w = w * inv
    return jnp.sum(w * disp_rows[:, :, None, :], axis=-1, keepdims=True)


def _inputs(mask_all_zero_row=False):
    logits = RNG.standard_normal((B, H, W, N)).astype(np.float32)
    sigma = RNG.uniform(0.05, 0.95, (B, H, W, N)).astype(np.float32)
    disp_rows = RNG.uniform(2.0, 40.0, (B, H, N)).astype(np.float32)
    mask = (RNG.uniform(0, 1, (B, H, N)) > 0.3).astype(np.float32)
    if mask_all_zero_row:
        mask[:, 2, :] = 0.0         # guarded-reciprocal pixels
    return tuple(jnp.asarray(x) for x in (logits, sigma, disp_rows, mask))


@pytest.mark.parametrize("zero_row", [False, True])
def test_disp_head_forward_matches_chain(zero_row):
    logits, sigma, disp_rows, mask = _inputs(zero_row)
    got = disp_head(logits, sigma, disp_rows, mask, True)
    want = xla_chain(logits, sigma, disp_rows, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_disp_head_grads_match_chain():
    logits, sigma, disp_rows, mask = _inputs()
    cot = jnp.asarray(RNG.standard_normal((B, H, W, 1)).astype(np.float32))

    def loss_kernel(l, s, d):
        return jnp.sum(disp_head(l, s, d, mask, True) * cot)

    def loss_chain(l, s, d):
        return jnp.sum(xla_chain(l, s, d, mask) * cot)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(logits, sigma, disp_rows)
    gc = jax.grad(loss_chain, argnums=(0, 1, 2))(logits, sigma, disp_rows)
    for name, a, b in zip(("logits", "sigma", "disp_rows"), gk, gc):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=2e-5,
                                   err_msg=name)


def test_decoder_disp_unchanged_by_routing():
    """The decoder's disp on CPU (XLA chain) must equal the kernel route
    (interpret) on identical head tensors — guards the wiring in
    models/depth_decoder.py."""
    logits, sigma, disp_rows, mask = _inputs()
    got = disp_head(logits, sigma, disp_rows, mask, True)
    # row-constant d broadcast to the (B, H, W, N) layered form
    want = xla_chain(logits, sigma, disp_rows, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
