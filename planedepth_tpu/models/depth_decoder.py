"""Plane-probability depth decoder (reference networks/depth_decoder.py:18-293).

U-Net decoder over the 5 encoder features with positional-encoding grid
injection at every scale, optional DenseASPP at the deepest stage, and three
heads:

  * ``dispconv`` — per-pixel plane logits,
  * ``sigmaconv`` — per-pixel mixture scales (use_mixture_loss),
  * ``residualconv`` — per-image plane-level offsets (plane_residual).

The orthogonal plane volume itself is pure geometry
(geometry/planes.build_plane_volume).  Everything is channels-last with the
plane axis LAST, so the softmax/compositing runs across TPU vector lanes.

Also includes ``DepthDecoderContinuous`` (reference depth_decoder.py:296-453),
the exported-but-untrained continuous-disparity variant, for API parity.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import PlaneConfig
from planedepth_tpu.geometry.camera import create_camera_plane, disp_to_depth
from planedepth_tpu.geometry.planes import build_plane_volume
from planedepth_tpu.models.denseaspp import DenseAspp
from planedepth_tpu.models.layers import (
    Conv3x3,
    ConvBlock,
    EpConv,
    frequency_embed,
    inject_grid,
)
from planedepth_tpu.ops.resize import upsample2x_nearest

Dtype = Any

NUM_CH_DEC = (16, 32, 64, 128, 256)


def render_probability_from_logits(
    logits: jnp.ndarray, dists: jnp.ndarray
) -> jnp.ndarray:
    """NeRF-style alpha compositing over the plane axis (last).

    Reference depth_decoder.py:261-273: ``alpha = 1 - exp(-relu(logit)*dist)``
    for the first N-1 planes, last plane alpha = 1, transmittance cumprod with
    the +1e-10 guard.

    Args:
      logits: ``(B, H, W, N-1)`` density logits.
      dists: ``(B, H, W, N-1)`` inter-plane metric distances along the ray.

    Returns:
      probability ``(B, H, W, N)``.
    """
    alpha = 1.0 - jnp.exp(-nn.relu(logits) * dists)
    ones = jnp.ones_like(alpha[..., :1])
    alpha = jnp.concatenate([alpha, ones], axis=-1)
    trans = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    return alpha * trans


def plane_dists(disp_layered: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Adjacent-plane metric distances along each pixel's camera ray.

    Reference depth_decoder.py:262-267: successive depth differences scaled by
    ``|K^-1 [x, y, 1]|``.

    Args:
      disp_layered: ``(B, H, W, N)``.

    Returns:
      ``(B, H, W, N-1)``.
    """
    depth_layered = disp_to_depth(disp_layered, width)
    d = depth_layered[..., 1:] - depth_layered[..., :-1]
    rays = create_camera_plane(height, width)            # (H, W, 3)
    ray_norm = jnp.linalg.norm(rays, axis=-1)[None, :, :, None]
    return d * ray_norm.astype(d.dtype)


def mixture_reweight(
    probability: jnp.ndarray,
    sigma: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``weights = pi / sigma`` renormalized over planes
    (reference depth_decoder.py:281-285).

    The guarded division repairs an unguarded one in the reference
    (depth_decoder.py:284): under render_probability every unmasked plane
    can carry zero alpha at init, making the weight sum 0 — the safe-where
    form also keeps the BACKWARD finite (a bare +eps still produces 1/eps
    gradient blowups at those pixels).
    """
    w = probability / sigma
    if padding_mask is not None:
        w = w * padding_mask
    # guard via a (B, H, W, 1) reciprocal so the backward saves no extra
    # full-size (B, H, W, N) residuals (each is ~5 GB at HR batch 8)
    s = jnp.sum(w, axis=-1, keepdims=True)
    inv = jnp.where(s > 1e-7, 1.0 / jnp.maximum(s, 1e-7), 0.0)
    return w * inv


class DepthDecoder(nn.Module):
    """Primary plane-probability head (reference depth_decoder.py:18-293)."""

    num_ch_enc: Sequence[int]
    planes: PlaneConfig = PlaneConfig()
    num_ep: int = 8
    pe_type: str = "neural"
    use_skips: bool = True
    use_denseaspp: bool = True
    use_mixture_loss: bool = True
    render_probability: bool = False
    plane_residual: bool = True
    fused_head: str = "auto"        # auto | off | interpret
    fused_head_bf16: bool = False   # bf16 heads in train (fused loss path)
    fused_sweep_loss: bool = False  # sweep kernel computes disp in train
    s2d_tail: str = "auto"          # auto | on | off (models/s2d.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: Sequence[jnp.ndarray],
        grid: jnp.ndarray,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.planes
        all_levels = cfg.all_levels

        # TPU layout surgery: run the finest scale in space-to-depth form
        # (models/s2d.py) so no (H, W, 16) tensor — which XLA stores with
        # an 8x lane-padded layout — ever materializes
        use_s2d = (
            self.s2d_tail == "on"
            or (self.s2d_tail == "auto" and jax.default_backend() == "tpu")
        ) and grid.shape[1] % 4 == 0 and grid.shape[2] % 4 == 0

        grid_ep = None
        ep_packed = False
        if self.num_ep > 0:
            if self.pe_type == "neural":
                if use_s2d:
                    # 1x1 convs commute with space-to-depth (per-pixel):
                    # the full-res C=8/16 PE tensors (16x lane-padded)
                    # never materialize; injections resize straight from
                    # the packed form (models/s2d.py)
                    from planedepth_tpu.models import s2d

                    k0, b0, k1, b1 = s2d.EpConvParams(
                        self.num_ep, name="epconv")()
                    grid_ep = s2d.epconv_s2d(
                        s2d.space_to_depth(grid.astype(self.dtype)),
                        k0, b0, k1, b1, self.dtype,
                    )
                    ep_packed = True
                else:
                    grid_ep = EpConv(
                        self.num_ep, dtype=self.dtype, name="epconv"
                    )(grid.astype(self.dtype))
            else:
                grid_ep = frequency_embed(grid, self.num_ep).astype(self.dtype)

        def inject(x):
            """Resize the PE features to x's spatial shape and concat
            (reference depth_decoder.py:128-139)."""
            if grid_ep is None:
                return x
            if ep_packed:
                from planedepth_tpu.models import s2d

                g = s2d.resize_from_s2d(grid_ep, x.shape[1:3])
                return jnp.concatenate([x, g.astype(x.dtype)], axis=-1)
            return inject_grid(x, grid_ep)

        x = input_features[-1].astype(self.dtype)
        x = inject(x)
        z4 = None
        for i in range(4, 0, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(self.dtype)], axis=-1
                )
            x = inject(x)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i == 4 and self.use_denseaspp:
                x = DenseAspp(dtype=self.dtype, name="denseaspp")(x, train)

        cin_00 = x.shape[-1]
        if use_s2d:
            from planedepth_tpu.models import s2d

            k0, b0 = s2d.ConvBlockParams(
                NUM_CH_DEC[0], cin_00, name="upconv_0_0")()
            k1, b1 = s2d.ConvBlockParams(
                NUM_CH_DEC[0], NUM_CH_DEC[0], name="upconv_0_1")()
            x1q = s2d.space_to_depth(x)            # (B, H/4, W/4, 4*cin)
            y4q = nn.elu(s2d.conv_valid(
                s2d.phase_pad(x1q, "reflect"), s2d.s2d_conv_kernel(k0),
                s2d.tile_bias(b0), self.dtype,
            ))                                     # s2d^2 of y (16ch full/2)
            zq = nn.elu(s2d.conv_valid(
                s2d.phase_pad(y4q, "edge"),
                s2d.s2d_conv_kernel(s2d.upsample_fuse_kernel(k1)),
                s2d.tile_bias(s2d.tile_bias(b1)), self.dtype,
            ))                                     # s2d^2 of z (16ch full)
            z4 = s2d.depth_to_space(zq)            # (B, H/2, W/2, 64)
            x = None
        else:
            x = ConvBlock(NUM_CH_DEC[0], dtype=self.dtype,
                          name="upconv_0_0")(x)
            x = upsample2x_nearest(x)
            x = ConvBlock(NUM_CH_DEC[0], dtype=self.dtype,
                          name="upconv_0_1")(x)

        B, H, W = grid.shape[0], grid.shape[1], grid.shape[2]
        outputs: Dict[str, jnp.ndarray] = {}

        residual_levels = None
        if self.plane_residual:
            if use_s2d:
                # global mean commutes with the (linear) 1x1 convs: pool
                # the phase-packed z4 back to 16 channels first — exact
                Bz, Hh, Wh, _ = z4.shape
                r_in = z4.reshape(Bz, Hh, Wh, 4, NUM_CH_DEC[0]).mean(
                    axis=(1, 2, 3), keepdims=False
                )[:, None, None, :]
            else:
                r_in = x
            r = nn.Conv(NUM_CH_DEC[0], (1, 1), dtype=self.dtype,
                        name="residualconv_0")(r_in)
            r = jnp.mean(r, axis=(1, 2), keepdims=True)   # AdaptiveAvgPool 1x1
            r = nn.Conv(all_levels, (1, 1), dtype=self.dtype,
                        name="residualconv_1")(r)
            residual_levels = (
                nn.sigmoid(r.astype(jnp.float32))[:, 0, 0, :] - 0.5
            )                                             # (B, N)

        vol = build_plane_volume(
            grid.astype(jnp.float32), cfg, W, residual_levels
        )
        outputs["disp_layered"] = vol.disp_layered
        outputs["padding_mask"] = vol.padding_mask
        outputs["distance"] = vol.distance
        outputs["norm"] = vol.normal
        if cfg.yz_levels == 0:
            # vertical+ground disparities are constant along each row —
            # enables the scatter-free warp path (ops/rowshift.py)
            outputs["disp_rows"] = vol.disp_layered[:, :, 0, :]

        fused_head = (
            self.use_mixture_loss
            and not self.render_probability
            and cfg.yz_levels == 0
            and (
                self.fused_head == "interpret"
                or (self.fused_head == "auto"
                    and jax.default_backend() == "tpu")
            )
        )
        # Fused TRAINING path: keep the plane heads in the compute dtype
        # (bf16) — the Pallas SWEEP kernel (which consumes them) upcasts
        # per-block in VMEM, so f32 materialization of the (B, H, W, N)
        # tensors would only add two ~1 GB HBM tensors + transposes per
        # step (PERF_NOTES.md r3).  Keyed on fused_sweep_loss, NOT on the
        # disp-HEAD kernel gate — the sweep computes the disp head itself
        # in this mode.  Eval keeps f32 heads: val metrics read `disp`
        # directly and bf16 logits quantization would leak into abs_rel.
        head_f32 = not (
            self.fused_sweep_loss and self.fused_head_bf16 and train
        )

        z4_padded = None

        def head_conv_s2d(features: int, name: str) -> jnp.ndarray:
            from planedepth_tpu.models import s2d

            nonlocal z4_padded
            if z4_padded is None:      # one shared pad for both heads
                z4_padded = s2d.phase_pad(z4, "reflect")
            kh, bh = s2d.Conv3x3Params(features, NUM_CH_DEC[0], name=name)()
            return s2d.conv_valid(
                z4_padded, s2d.s2d_conv_kernel(kh),
                s2d.tile_bias(bh), self.dtype,
            )                                      # (B, H/2, W/2, 4*feat)

        def head_conv(features: int, name: str) -> jnp.ndarray:
            """Full-res 3x3 head conv, on x or (s2d path) on z4."""
            if not use_s2d:
                return Conv3x3(features, dtype=self.dtype, name=name)(x)
            from planedepth_tpu.models import s2d

            return s2d.depth_to_space(head_conv_s2d(features, name))

        n_logits = all_levels - 1 if self.render_probability else all_levels
        if (use_s2d and self.fused_sweep_loss and train
                and self.use_mixture_loss):
            # fused-sweep training with the s2d tail: ONE merged head conv
            # whose output channels interleave dispconv/sigmaconv at the
            # WEIGHT level (within each s2d phase block, channel 2c is
            # logits plane c and 2c+1 is sigma plane c).  One plane-first
            # transpose in the loss then yields exactly the (B, 2N, H, W)
            # ``ls`` operand of ops/pallas_sweep.fused_plane_sweep_packed
            # — separate full-res logits/sigma (and the stack/interleave
            # copy + its adjoint) never exist.  The param tree is
            # unchanged: the canonical kernels are interleaved at APPLY
            # time, so checkpoints, torch conversion and the non-fused
            # path are untouched.  Raw logits — the sweep kernel applies
            # the (row-constant) padding mask itself.
            from planedepth_tpu.models import s2d

            kl, bl = s2d.Conv3x3Params(
                n_logits, NUM_CH_DEC[0], name="dispconv")()
            ks, bs = s2d.Conv3x3Params(
                all_levels, NUM_CH_DEC[0], name="sigmaconv")()
            km = jnp.stack([kl, ks], axis=-1).reshape(
                3, 3, NUM_CH_DEC[0], 2 * all_levels)
            bm = jnp.stack([bl, bs], axis=-1).reshape(2 * all_levels)
            ls4 = s2d.conv_valid(
                s2d.phase_pad(z4, "reflect"), s2d.s2d_conv_kernel(km),
                None, self.dtype,
            )                                  # (B, H/2, W/2, 4*2N)
            if head_f32:
                ls4 = ls4.astype(jnp.float32)
            # RAW head, conv WITHOUT its bias: both the bias add and the
            # sigma sigmoid+clip epilogue
            # (ops/pallas_sweep_quad.ls_epilogue) are applied by the
            # CONSUMER — inside the relayout kernel on the aligned quad
            # path (free there; the r5 traces showed ANY XLA elementwise
            # between this conv and the kernel — clamp_select first, the
            # bias broadcast_add after the epilogue moved — runs as a
            # standalone full-res pass between two layout copies,
            # ~11 ms/step), in XLA on the v1/fallback paths.
            outputs["ls_s2d"] = ls4
            outputs["ls_bias"] = s2d.tile_bias(bm)
            return outputs

        logits = head_conv(n_logits, "dispconv")
        if head_f32:
            logits = logits.astype(jnp.float32)
        if self.render_probability:
            logits = logits * vol.padding_mask[..., : all_levels - 1]
            dists = plane_dists(vol.disp_layered, W, H)
            outputs["dists"] = dists
            probability = render_probability_from_logits(logits, dists)
            logits = jnp.concatenate(
                [logits, jnp.ones_like(logits[..., :1])], axis=-1
            )
        else:
            logits = logits * vol.padding_mask.astype(logits.dtype)
            probability = nn.softmax(logits.astype(jnp.float32), axis=-1)
        outputs["logits"] = logits

        if self.use_mixture_loss:
            sigma_raw = head_conv(all_levels, "sigmaconv")
            if head_f32:
                sigma_raw = sigma_raw.astype(jnp.float32)
            sigma = jnp.clip(nn.sigmoid(sigma_raw), 0.01, 1.0)
            outputs["sigma"] = sigma
            outputs["pi"] = probability
            probability = mixture_reweight(
                probability, sigma.astype(jnp.float32), vol.padding_mask
            )

        outputs["probability"] = probability
        if self.fused_sweep_loss and train:
            # fused training: the SWEEP kernel computes the expected
            # disparity from its own streamed center samples
            # (ops/pallas_sweep.py with_disp; consumed by
            # train/step.py:fused_stereo_losses) — the decoder emits no
            # disp/depth at all in this mode
            return outputs
        if fused_head:
            # one streaming Pallas pass (softmax + mixture reweight +
            # contraction, hand VJP) — lets XLA dead-code the f32
            # probability chain whenever nothing else consumes it
            # (ops/pallas_disp.py).  shard_kernel partitions the call over
            # the ambient GSPMD mesh (parallel/shard.py).
            from planedepth_tpu.ops.pallas_disp import disp_head
            from planedepth_tpu.parallel.shard import shard_kernel

            interpret = self.fused_head == "interpret"
            head = shard_kernel(
                lambda lg, sg, dr, mr: disp_head(lg, sg, dr, mr, interpret),
                in_rows=(1, 1, 1, 1),
                out_rows=(1,),
            )
            outputs["disp"] = head(
                logits, sigma, vol.disp_layered[:, :, 0, :],
                vol.padding_mask[:, :, 0, :],
            )
        elif cfg.yz_levels == 0:
            # disparities are constant along each row: contract against the
            # (B, H, 1, N) slice so the full (B, H, W, N) disp_layered never
            # needs to materialize for this product (XLA fuses the broadcast)
            outputs["disp"] = jnp.sum(
                probability * vol.disp_layered[:, :, :1, :],
                axis=-1, keepdims=True,
            )
        else:
            outputs["disp"] = jnp.sum(
                probability * vol.disp_layered, axis=-1, keepdims=True
            )
        outputs["depth"] = disp_to_depth(outputs["disp"], W)
        return outputs


class DepthDecoderContinuous(nn.Module):
    """Continuous-disparity variant (reference depth_decoder.py:296-453).

    Per-pixel sigmoid disparity levels from ``dispconv`` + separate ``piconv``
    logits; no orthogonal plane construction.  Exported for API parity with
    the reference (never instantiated by its trainer).
    """

    num_ch_enc: Sequence[int]
    planes: PlaneConfig = PlaneConfig(xz_levels=0, yz_levels=0)
    num_ep: int = 8
    pe_type: str = "neural"
    use_skips: bool = True
    use_denseaspp: bool = True
    use_mixture_loss: bool = True
    render_probability: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: Sequence[jnp.ndarray],
        grid: jnp.ndarray,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.planes
        n_levels = cfg.disp_levels + cfg.xz_levels

        grid_ep = None
        if self.num_ep > 0:
            if self.pe_type == "neural":
                grid_ep = EpConv(self.num_ep, dtype=self.dtype, name="epconv")(
                    grid.astype(self.dtype)
                )
            else:
                grid_ep = frequency_embed(grid, self.num_ep).astype(self.dtype)

        x = input_features[-1].astype(self.dtype)
        x = inject_grid(x, grid_ep)
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(self.dtype)], axis=-1
                )
            if i > 0:
                x = inject_grid(x, grid_ep)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i == 4 and self.use_denseaspp:
                x = DenseAspp(dtype=self.dtype, name="denseaspp")(x, train)

        B, H, W, _ = x.shape
        outputs: Dict[str, jnp.ndarray] = {}

        disp_levels = nn.sigmoid(
            Conv3x3(n_levels, dtype=self.dtype, name="dispconv")(x)
            .astype(jnp.float32)
        )
        outputs["disp_levels"] = disp_levels
        disp_layered = cfg.disp_max * (
            cfg.disp_min / cfg.disp_max
        ) ** disp_levels
        outputs["disp_layered"] = disp_layered

        n_pi = n_levels - 1 if self.render_probability else n_levels
        logits = Conv3x3(n_pi, dtype=self.dtype, name="piconv")(x).astype(
            jnp.float32
        )
        if self.render_probability:
            dists = plane_dists(disp_layered, W, H)
            outputs["dists"] = dists
            probability = render_probability_from_logits(logits, dists)
            logits = jnp.concatenate(
                [logits, jnp.ones_like(logits[..., :1])], axis=-1
            )
        else:
            probability = nn.softmax(logits, axis=-1)
        outputs["logits"] = logits

        if self.use_mixture_loss:
            sigma = nn.sigmoid(
                Conv3x3(n_levels, dtype=self.dtype, name="sigmaconv")(x)
                .astype(jnp.float32)
            )
            sigma = jnp.clip(sigma, 0.01, 1.0)
            outputs["sigma"] = sigma
            outputs["pi"] = probability
            probability = mixture_reweight(probability, sigma)

        outputs["probability"] = probability
        outputs["disp"] = jnp.sum(
            probability * disp_layered, axis=-1, keepdims=True
        )
        outputs["depth"] = disp_to_depth(outputs["disp"], W)
        return outputs
