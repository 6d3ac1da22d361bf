"""grid_sample / shift_sample parity vs. the torch oracle.

torch (CPU) is used ONLY as a test oracle for primitive semantics
(F.grid_sample with align_corners=True), never in the library itself.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from planedepth_tpu.ops import grid_sample, grid_sample_planes, shift_sample_x

RNG = np.random.default_rng(0)


def _torch_grid_sample(img_nhwc, coords, padding_mode):
    img = torch.from_numpy(np.moveaxis(img_nhwc, -1, 1).copy())
    grid = torch.from_numpy(coords.copy())
    out = F.grid_sample(
        img, grid, mode="bilinear", padding_mode=padding_mode,
        align_corners=True,
    )
    return np.moveaxis(out.numpy(), 1, -1)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(padding_mode):
    B, H, W, C = 2, 7, 11, 3
    img = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    # include far out-of-bounds coords
    coords = RNG.uniform(-1.7, 1.7, (B, 5, 9, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords),
                                  padding_mode))
    ref = _torch_grid_sample(img, coords, padding_mode)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_exact_corners():
    # sampling exactly at normalized corners hits the corner pixels
    img = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    coords = np.array(
        [[[[-1.0, -1.0], [1.0, -1.0]], [[-1.0, 1.0], [1.0, 1.0]]]],
        dtype=np.float32,
    )
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(out[0, :, :, 0], [[0.0, 3.0], [8.0, 11.0]])


def test_grid_sample_planes_shape():
    B, H, W, C, N = 2, 6, 8, 5, 3
    img = jnp.asarray(RNG.standard_normal((B, H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        RNG.uniform(-1, 1, (B, N, H, W, 2)).astype(np.float32)
    )
    out = grid_sample_planes(img, coords)
    assert out.shape == (B, N, H, W, C)
    # plane 0 equals a direct sample
    direct = grid_sample(img, coords[:, 0])
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(direct),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_shift_sample_x_matches_grid_sample(padding_mode):
    B, H, W, C, N = 2, 6, 10, 4, 5
    img = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    shift = RNG.uniform(-6.0, 6.0, (B, N, H, W)).astype(np.float32)
    xs = np.arange(W, dtype=np.float32)[None, None, None, :] + shift
    ys = np.broadcast_to(
        np.arange(H, dtype=np.float32)[None, None, :, None], shift.shape
    )
    coords = np.stack(
        [(xs / (W - 1) - 0.5) * 2.0, (ys / (H - 1) - 0.5) * 2.0], axis=-1
    )
    ours = np.asarray(shift_sample_x(jnp.asarray(img), jnp.asarray(shift),
                                     padding_mode))
    ref = _torch_grid_sample(
        np.repeat(img, N, axis=0),
        coords.reshape(B * N, H, W, 2),
        padding_mode,
    ).reshape(B, N, H, W, C)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
