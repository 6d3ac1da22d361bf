"""Forward-only Pallas row-shift sampler vs the XLA gather path, and the
distill teacher routed through it (pallas_spec) vs the gather baseline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planedepth_tpu.ops.pallas_shift import rowshift_planes_fwd
from planedepth_tpu.ops.rowshift import rowshift_sample

pytestmark = pytest.mark.heavy

B, H, W, N = 2, 8, 64, 6
RNG = np.random.default_rng(3)


def test_rowshift_planes_matches_gather_path():
    maps = jnp.asarray(RNG.uniform(0, 1, (B, H, W, N)).astype(np.float32))
    shift = jnp.asarray(RNG.uniform(-10, 10, (B, H, N)).astype(np.float32))
    got = rowshift_planes_fwd(maps, shift, pad=16, rows=4, interpret=True)
    want = rowshift_sample(maps, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_rowshift_planes_vertical_vec_path():
    maps = jnp.asarray(RNG.uniform(0, 1, (B, H, W, N)).astype(np.float32))
    shift = np.broadcast_to(
        RNG.uniform(-10, 10, (B, 1, N)), (B, H, N)
    ).astype(np.float32)
    # first 3 planes row-constant -> vec path; rest per-row
    shift = np.array(shift)
    shift[:, :, 3:] = RNG.uniform(-10, 10, (B, H, N - 3))
    shift = jnp.asarray(shift)
    got = rowshift_planes_fwd(maps, shift, pad=16, rows=4, interpret=True,
                              n_vertical=3)
    want = rowshift_sample(maps, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_distill_teacher_pallas_spec_matches_gather():
    """generate_post_process_disp via the Pallas sampler (interpret) must
    equal the XLA gather baseline."""
    from planedepth_tpu.train.distill import generate_post_process_disp

    Np = 6
    H2, W2 = 8, 64

    def fake_teacher(images, grids):
        b = images.shape[0]
        rng = np.random.default_rng(11)
        logits = jnp.asarray(
            rng.standard_normal((1, H2, W2, Np)).astype(np.float32)
        )
        logits = jnp.broadcast_to(logits, (b, H2, W2, Np))
        # row-constant layered disparities (vertical-plane structure)
        d = jnp.asarray(
            np.linspace(2.0, 10.0, Np, dtype=np.float32)
        )[None, None, None, :]
        disp_layered = jnp.broadcast_to(d, (b, H2, W2, Np))
        prob = jax.nn.softmax(logits, axis=-1)
        disp = jnp.sum(prob * disp_layered, -1, keepdims=True)
        return {"probability": prob, "disp_layered": disp_layered,
                "logits": logits, "disp": disp}

    img = jnp.asarray(RNG.uniform(0, 1, (2, H2, W2, 3)).astype(np.float32))
    grid = jnp.zeros((2, H2, W2, 2), jnp.float32)

    pp_a, mn_a = generate_post_process_disp(fake_teacher, img, grid, 0)
    pp_b, mn_b = generate_post_process_disp(
        fake_teacher, img, grid, 0, pallas_spec=(16, Np, True)
    )
    np.testing.assert_allclose(np.asarray(pp_a), np.asarray(pp_b),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mn_a), np.asarray(mn_b),
                               rtol=1e-4, atol=1e-5)
