"""The scatter-free rowshift warp path must match the general path exactly
(forward AND gradients) for row-constant disparities."""
import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import PlaneConfig
from planedepth_tpu.geometry import build_plane_volume, identity_norm_grid
from planedepth_tpu.train.view_synthesis import pred_novel_images

B, H, W = 2, 16, 32
CFG = PlaneConfig(disp_levels=5, disp_min=2, disp_max=12, xz_levels=3,
                  yz_levels=0)
N = CFG.all_levels
RNG = np.random.default_rng(5)


def _outputs_and_inputs():
    grid = jnp.broadcast_to(identity_norm_grid(H, W)[None], (B, H, W, 2))
    vol = build_plane_volume(grid, CFG, W)
    logits = jnp.asarray(RNG.standard_normal((B, H, W, N)).astype(np.float32))
    sigma = jnp.asarray(
        RNG.uniform(0.05, 0.9, (B, H, W, N)).astype(np.float32)
    )
    rgb = jnp.asarray(RNG.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    outputs = {
        "disp_layered": vol.disp_layered,
        "padding_mask": vol.padding_mask,
        "distance": vol.distance,
        "norm": vol.normal,
        "logits": logits,
        "sigma": sigma,
    }
    return outputs, rgb


def _run(outputs, rgb, use_rowshift):
    out = dict(outputs)
    if use_rowshift:
        out["disp_rows"] = out["disp_layered"][:, :, 0, :]
    rec = pred_novel_images(
        out, rgb, ("r",), {"r": None}, None, None,
        warp_type="disp_warp", use_mixture_loss=True,
        rowshift=use_rowshift,
    )
    return rec


def test_rowshift_path_matches_general_path():
    outputs, rgb = _outputs_and_inputs()
    rec_a = _run(outputs, rgb, use_rowshift=True)
    rec_b = _run(outputs, rgb, use_rowshift=False)
    for k in rec_a:
        np.testing.assert_allclose(
            np.asarray(rec_a[k]), np.asarray(rec_b[k]),
            rtol=1e-4, atol=1e-5, err_msg=str(k),
        )


def test_rowshift_path_gradients_match():
    outputs, rgb = _outputs_and_inputs()

    def loss(logits, sigma, rgb, use_rowshift):
        out = dict(outputs)
        out["logits"] = logits
        out["sigma"] = sigma
        rec = _run(out, rgb, use_rowshift)
        return (
            jnp.sum(rec[("rgb_rec", "r")] ** 2)
            + jnp.sum(rec[("probability_rec", "r")] * jnp.arange(N))
        )

    g_a = jax.grad(loss, argnums=(0, 1, 2))(
        outputs["logits"], outputs["sigma"], rgb, True
    )
    g_b = jax.grad(loss, argnums=(0, 1, 2))(
        outputs["logits"], outputs["sigma"], rgb, False
    )
    for a, b, name in zip(g_a, g_b, ("logits", "sigma", "rgb")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=name,
        )
