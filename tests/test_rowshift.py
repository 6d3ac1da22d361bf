"""Row-shift sampler: forward parity with shift_sample_x and VJP parity
with XLA autodiff of the naive gather formulation."""
import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.ops.rowshift import rowshift_sample, rowshift_sample_shared
from planedepth_tpu.ops.sampling import shift_sample_x

RNG = np.random.default_rng(21)
B, H, W, N, C = 2, 5, 16, 4, 3


def _shift_rows():
    return jnp.asarray(
        RNG.uniform(-7.0, 7.0, (B, H, N)).astype(np.float32)
    )


def _naive_diag(maps, shift_rows):
    """Reference: per-plane shift_sample_x of each plane's own map."""
    shift_full = jnp.broadcast_to(
        jnp.moveaxis(shift_rows, -1, 1)[:, :, :, None], (B, N, H, W)
    )

    def one(m, s):
        return shift_sample_x(m[..., None], s[:, None])[:, 0, ..., 0]

    out = jax.vmap(one, in_axes=(3, 1), out_axes=3)(maps, shift_full)
    return out


def test_rowshift_forward_matches_naive():
    maps = jnp.asarray(RNG.standard_normal((B, H, W, N)).astype(np.float32))
    s = _shift_rows()
    np.testing.assert_allclose(
        np.asarray(rowshift_sample(maps, s)),
        np.asarray(_naive_diag(maps, s)),
        rtol=1e-5, atol=1e-5,
    )


def test_rowshift_vjp_matches_autodiff():
    maps = jnp.asarray(RNG.standard_normal((B, H, W, N)).astype(np.float32))
    s = _shift_rows()
    g = jnp.asarray(RNG.standard_normal((B, H, W, N)).astype(np.float32))

    _, vjp_ours = jax.vjp(rowshift_sample, maps, s)
    _, vjp_ref = jax.vjp(_naive_diag, maps, s)
    dm_o, ds_o = vjp_ours(g)
    dm_r, ds_r = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dm_o), np.asarray(dm_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds_o), np.asarray(ds_r),
                               rtol=1e-4, atol=1e-4)


def _naive_shared(image, shift_rows):
    shift_full = jnp.broadcast_to(
        jnp.moveaxis(shift_rows, -1, 1)[:, :, :, None], (B, N, H, W)
    )
    return shift_sample_x(image, shift_full)


def test_rowshift_shared_forward_matches_naive():
    img = jnp.asarray(RNG.standard_normal((B, H, W, C)).astype(np.float32))
    s = _shift_rows()
    np.testing.assert_allclose(
        np.asarray(rowshift_sample_shared(img, s)),
        np.asarray(_naive_shared(img, s)),
        rtol=1e-5, atol=1e-5,
    )


def test_rowshift_shared_vjp_matches_autodiff():
    img = jnp.asarray(RNG.standard_normal((B, H, W, C)).astype(np.float32))
    s = _shift_rows()
    g = jnp.asarray(
        RNG.standard_normal((B, N, H, W, C)).astype(np.float32)
    )
    _, vjp_ours = jax.vjp(rowshift_sample_shared, img, s)
    _, vjp_ref = jax.vjp(_naive_shared, img, s)
    di_o, ds_o = vjp_ours(g)
    di_r, ds_r = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(di_o), np.asarray(di_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds_o), np.asarray(ds_r),
                               rtol=1e-4, atol=1e-4)


def test_rowshift_integer_shift_exact():
    """Integer shift: output equals a plain slice with zero fill."""
    maps = jnp.asarray(RNG.standard_normal((1, 2, 8, 1)).astype(np.float32))
    s = jnp.full((1, 2, 1), 3.0)
    out = np.asarray(rowshift_sample(maps, s))[0, :, :, 0]
    ref = np.zeros_like(out)
    ref[:, : 8 - 3] = np.asarray(maps)[0, :, 3:, 0]
    np.testing.assert_allclose(out, ref, atol=1e-6)
