"""Self-distillation teacher pass + mirror occlusion masks.

``generate_post_process_disp`` (reference trainer.py:404-466): the frozen
teacher runs on [x, flip(x)]; stereo-consistency occlusion masks are derived
from cross-warped probability volumes; the blended post-processed disparity
``disp_pp`` becomes the distillation target.

``mirror_occlusion_mask`` (reference trainer.py:636-669): occlusion masks
from the L/R probability volumes of the flip-doubled batch under
``--use_mom``.  NOTE the reference implementation references
``self.pix_coords_r/_l`` which are never assigned (it crashes if enabled);
here the intended warp grids — +/- the layered disparities, exactly the ones
``generate_post_process_disp`` builds — are used.

All warps are horizontal shifts, so sampling uses the 1-D
:func:`ops.sampling.shift_sample_x` specialization.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from planedepth_tpu.ops.sampling import shift_sample_x


def flip_w(x: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of an NHWC tensor."""
    return x[:, :, ::-1]


def flip_grid(grid: jnp.ndarray) -> jnp.ndarray:
    """Flip the normalized aug grid: negate x, mirror W
    (reference trainer.py:258-260,408-410)."""
    g = grid.at[..., 0].multiply(-1.0)
    return g[:, :, ::-1]


def _shift_sample_per_plane(
    maps: jnp.ndarray, shift: jnp.ndarray, pallas_spec=None
) -> jnp.ndarray:
    """Sample each plane's own map at its own horizontal shift.

    Args:
      maps: ``(B, H, W, N)``.
      shift: ``(B, H, W, N)`` source offset in pixels (row-constant along W
        for the vertical/ground plane volume).
      pallas_spec: ``(pad, n_vertical, interpret)`` to route through the
        fused Pallas sampler (``ops.pallas_shift``) — XLA lane gathers are
        near-scalar on TPU; None keeps the XLA gather path (CPU tests).

    Returns:
      ``(B, H, W, N)``.
    """
    if pallas_spec is not None:
        from planedepth_tpu.ops.pallas_shift import rowshift_planes_fwd
        from planedepth_tpu.parallel.shard import shard_kernel

        pad, n_vertical, interpret = pallas_spec
        sampler = shard_kernel(
            lambda m, s: rowshift_planes_fwd(
                m, s, pad=pad, interpret=interpret, n_vertical=n_vertical
            ),
            in_rows=(1, 1),
            out_rows=(1,),
        )
        return sampler(maps, shift[:, :, 0, :])

    def one_plane(m, s):
        # m, s: (B, H, W)
        return shift_sample_x(m[..., None], s[:, None])[:, 0, ..., 0]

    out = jax.vmap(one_plane, in_axes=(3, 3), out_axes=3)(maps, shift)
    return out


def generate_post_process_disp(
    teacher_apply: Callable,
    color_aug_l: jnp.ndarray,
    grid: jnp.ndarray,
    num_ep: int,
    pallas_spec=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher post-processed disparity (reference trainer.py:404-466).

    Args:
      teacher_apply: frozen ``(image, grid) -> outputs`` forward.
      color_aug_l: ``(B, H, W, 3)``.
      grid: ``(B, H, W, 2)``.

    Returns:
      (disp_pp ``(B, H, W, 1)``, mask_novel ``(B, H, W, 1)``), both
      stop-gradiented.
    """
    images = jnp.concatenate([color_aug_l, flip_w(color_aug_l)], axis=0)
    grids = jnp.concatenate([grid, flip_grid(grid)], axis=0)
    outputs = teacher_apply(images, grids)

    prob = outputs["probability"]          # (2B, H, W, N)
    B = prob.shape[0] // 2
    disp_layered = outputs["disp_layered"]
    logits = outputs["logits"]

    shift_r = disp_layered[:B]             # sample at x + d  (to right view)
    shift_l = -disp_layered[B:]            # sample at x - d_flipped

    # o_l: left-view occlusion coverage (trainer.py:443-449)
    plr = _shift_sample_per_plane(logits[:B], shift_r, pallas_spec)
    plr = nn.softmax(plr, axis=-1)
    o_l = jnp.sum(
        _shift_sample_per_plane(plr, shift_l, pallas_spec), axis=-1, keepdims=True
    )
    o_l = jnp.minimum(o_l, 1.0)

    # o_fr: flipped-right coverage (trainer.py:451-456)
    pfr = flip_w(logits[B:])
    pfrl = _shift_sample_per_plane(pfr, shift_l, pallas_spec)
    pfrl = nn.softmax(pfrl, axis=-1)
    o_fr = jnp.sum(
        _shift_sample_per_plane(pfrl, shift_r, pallas_spec), axis=-1, keepdims=True
    )
    o_fr = jnp.minimum(o_fr, 1.0)

    disp = outputs["disp"]                 # (2B, H, W, 1)
    mean_disp = disp[:B] * 0.5 + flip_w(disp[B:]) * 0.5
    disp_pp = mean_disp * o_fr + disp[:B] * (1.0 - o_fr)
    disp_pp = disp_pp * o_l + flip_w(disp[B:]) * (1.0 - o_l)

    mask_novel = jnp.sum(
        _shift_sample_per_plane(prob[:B], shift_r, pallas_spec), axis=-1, keepdims=True
    )
    mask_novel = jnp.minimum(mask_novel, 1.0)
    return jax.lax.stop_gradient(disp_pp), jax.lax.stop_gradient(mask_novel)


def mirror_occlusion_mask(
    outputs: Dict[str, jnp.ndarray],
    rec: Dict,
    pallas_spec=None,
) -> jnp.ndarray:
    """Mirror occlusion mask under flip_right doubling
    (reference trainer.py:636-669, with the undefined-grid bug repaired).

    Returns ``(2B, H, W, 1)`` mask_novel, stop-gradiented.
    """
    prob = outputs["probability"]            # (2B, H, W, N)
    B = prob.shape[0] // 2
    disp_layered = outputs["disp_layered"]
    prob_rec = rec[("probability_rec", "r")]

    pll = prob[:B]
    prr = flip_w(prob[B:])
    plr = prob_rec[:B]
    prl = flip_w(prob_rec[B:])

    shift_r = disp_layered[:B]
    shift_l = -disp_layered[:B]

    o_r_a = jnp.sum(_shift_sample_per_plane(pll, shift_r, pallas_spec), -1, keepdims=True)
    o_r_b = jnp.sum(_shift_sample_per_plane(prl, shift_r, pallas_spec), -1, keepdims=True)
    o_r = jnp.minimum(o_r_a * o_r_b, 1.0)

    o_l_a = jnp.sum(_shift_sample_per_plane(prr, shift_l, pallas_spec), -1, keepdims=True)
    o_l_b = jnp.sum(_shift_sample_per_plane(plr, shift_l, pallas_spec), -1, keepdims=True)
    o_l = jnp.minimum(o_l_a * o_l_b, 1.0)

    mask = jnp.concatenate([o_r, flip_w(o_l)], axis=0)
    return jax.lax.stop_gradient(mask)


def fused_mom_mask_novel(
    outputs: Dict[str, jnp.ndarray],
    use_mixture_loss: bool,
    pallas_spec=None,
) -> jnp.ndarray:
    """``mask_novel`` for ``--use_mom`` on the fused loss paths.

    The fused Pallas sweep composites in-kernel and never materializes the
    ``probability`` / ``probability_rec`` volumes (reference
    trainer.py:593-602) that the mirror occlusion mask consumes
    (trainer.py:636-669).  The mask is stop-gradient, so both volumes are
    rebuilt here OUTSIDE the differentiated graph: source-view probability
    exactly as the decoder's non-fused head
    (models/depth_decoder.py:354-378), target-view ``probability_rec``
    exactly as ``pred_novel_images`` (train/view_synthesis.py:190-218),
    with the warps on the forward-only Pallas row-shift sampler — a few
    extra shift sweeps of the (2B, H, W, N) head tensors per step, not an
    XLA lane gather.
    """
    from planedepth_tpu.models.depth_decoder import mixture_reweight

    disp_layered = jax.lax.stop_gradient(outputs["disp_layered"])
    pmask = jax.lax.stop_gradient(outputs["padding_mask"])

    if "ls_s2d" in outputs:
        # merged s2d head: (2B, H/2, W/2, 4*2N) phase blocks, channel 2c =
        # logits plane c / 2c+1 = sigma (models/depth_decoder.py merged
        # head conv, emitted RAW without its bias) -> full-res plane-last
        # heads
        from planedepth_tpu.ops.pallas_sweep_quad import ls_epilogue

        ls4 = jax.lax.stop_gradient(
            ls_epilogue(outputs["ls_s2d"], outputs.get("ls_bias")))
        B2, Hh, Wh, C4 = ls4.shape
        n2 = C4 // 4
        full = ls4.reshape(B2, Hh, Wh, 2, 2, n2)
        full = full.transpose(0, 1, 3, 2, 4, 5).reshape(
            B2, 2 * Hh, 2 * Wh, n2)
        logits = full[..., 0::2].astype(jnp.float32)
        sigma = full[..., 1::2].astype(jnp.float32)
    else:
        logits = jax.lax.stop_gradient(outputs["logits"]).astype(jnp.float32)
        sigma = outputs.get("sigma")
        if sigma is not None:
            sigma = jax.lax.stop_gradient(sigma).astype(jnp.float32)
    if not use_mixture_loss:
        sigma = None

    probability = nn.softmax(logits, axis=-1)
    if sigma is not None:
        probability = mixture_reweight(probability, sigma, pmask)

    # probability_rec, target side 'r': warp by +disp (the row-constant
    # padding mask commutes with horizontal shifts), mask, softmax,
    # mixture-reweight — pred_novel_images semantics bit-for-bit
    shift_r = jnp.broadcast_to(disp_layered, logits.shape)
    logit_rec = _shift_sample_per_plane(logits, shift_r, pallas_spec) * pmask
    pi_rec = nn.softmax(logit_rec, axis=-1)
    if sigma is not None:
        sigma_rec = jnp.clip(
            _shift_sample_per_plane(sigma, shift_r, pallas_spec) * pmask,
            0.01, 1.0,
        )
        prob_rec = mixture_reweight(pi_rec, sigma_rec)
    else:
        prob_rec = pi_rec

    mom_outputs = {"probability": probability, "disp_layered": shift_r}
    return mirror_occlusion_mask(
        mom_outputs, {("probability_rec", "r"): prob_rec},
        pallas_spec=pallas_spec,
    )
