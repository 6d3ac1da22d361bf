"""Fused monocular / 2-D-warp training losses (TPU path).

The reference trains mono via per-plane homographies or depth warps
(trainer.py:533-538,556-560) and assembles the same mixture/L1 losses as
the stereo path (trainer.py:701-773).  On TPU the XLA-gather sampling of
those modes is ~170x slower than kernel sampling (PERF_NOTES.md); this
module routes the per-plane 2-D sampling through
``ops.pallas_warp2d.warp2d_sample`` and assembles the losses PLANE-FIRST
(``(B, N, H, W)``, W on lanes) so no C-minor or plane-last layout ever
materializes on the hot path.

Semantically identical to ``view_synthesis.pred_novel_images`` +
``losses.compute_losses`` for the covered modes — pinned by
tests/test_warp2d_train.py against the oracle step.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import PlaneConfig, TrainConfig
from planedepth_tpu.geometry.warp import (
    depth_warp_coords,
    disp_warp_shift,
    homography_warp_coords,
)
from planedepth_tpu.ops.losses import smooth_loss_disp
from planedepth_tpu.ops.pallas_warp2d import prepare_coords, warp2d_sample
from planedepth_tpu.parallel.shard import shard_kernel
from planedepth_tpu.train.losses import perceptual_loss

F32 = jnp.float32


def fused_warp2d_ok(cfg: TrainConfig) -> bool:
    """True when training routes 2-D warps through the warp2d kernel.

    Covers ``homography_warp`` and ``depth_warp`` (all target sides,
    stereo + temporal), with or without the mixture loss, with
    render_probability (the NeRF compositing runs in XLA on the kernel's
    warped logits), and with alpha_self (the self-reconstruction is ONE
    3-channel per-pixel XLA gather — cheap at that scale).

    Also RESCUES the ``disp_warp`` configs the plane-sweep kernels
    cannot take (render_probability needs the per-plane warped logits;
    yz side planes have column-varying disparity): a stereo disparity
    warp is the dx = disp, dy = 0 special case of this kernel
    (geometry/warp.py:disp_warp_shift), so those recipes ride warp2d for
    every side instead of the ~170x XLA-gather oracle.

    Excluded (the XLA-gather oracle with its loud fence remains):
    use_mom — a niche flag off every published recipe.
    """
    rescue = cfg.warp_type == "disp_warp" and (
        cfg.model.render_probability or cfg.model.planes.yz_levels > 0
    )
    return (
        cfg.fused_sweep
        and (cfg.warp_type in ("homography_warp", "depth_warp") or rescue)
        and not cfg.loss.use_mom
    )


def _coords_to_disp(coords, H, W):
    """Normalized align_corners grid -> pixel displacements (dx, dy)."""
    xs = (coords[..., 0] * 0.5 + 0.5) * (W - 1)
    ys = (coords[..., 1] * 0.5 + 0.5) * (H - 1)
    x = jnp.arange(W, dtype=F32)
    y = jnp.arange(H, dtype=F32)[:, None]
    return xs - x, ys - y


def _tile_spreads(d: np.ndarray, rows: int, tile: int = 128) -> np.ndarray:
    """Per-plane max (row-block, lane-tile) integer spread of a
    displacement field ``(1, N, H, W)`` -> ``(N,)``."""
    _, N, H, W = d.shape
    k = np.floor(d).astype(np.int64)
    k = k.reshape(N, H // rows, rows, W // tile, tile)
    s = k.max(axis=(2, 4)) - k.min(axis=(2, 4))
    return s.max(axis=(1, 2))


@functools.lru_cache(maxsize=8)
def warp2d_plan(
    plane_cfg: PlaneConfig,
    warp_type: str,
    H: int,
    W: int,
    rows: int,
    tz_env: float,
    aug_margin: float,
    n_groups: int,
    sx_floor: int,
    sy_floor: int,
    sx_cap: int,
    sy_cap: int,
    temporal: bool = True,
) -> Tuple[Tuple[int, int, int, int], ...]:
    """Static plane-group tap plan for the warp2d kernel.

    The per-tile integer displacement spread of a plane-induced 2-D warp
    is zoom-dominated and GEOMETRIC in the plane index (each nearer
    plane of the reference's geometric disparity ladder,
    depth_decoder.py:153, zooms ~1/0.9x harder under forward
    ego-motion), so one static tap bound is either wasteful on the far
    planes or clipped on the near ones.  This probes the EXACT warp
    pipeline (the same geometry functions the loss uses) at a small set
    of envelope poses — forward/backward translation ``tz_env`` in model
    units (0.1 ~ 0.54 m/frame ~ 19 km/h at 10 Hz) with lateral/rotation
    jitter — measures each plane's max per-tile spread, scales by
    ``aug_margin`` (RandomResizeCrop factors up to 1.5 grow on-screen
    disparities), and DP-partitions the planes into <= ``n_groups``
    contiguous ranges minimizing total tap cost
    ``sum n_g * (sx_g + 2) * (sy_g + 2)``.

    Returns a tuple of ``(start, count, sx, sy)``.  Planes whose runtime
    spread exceeds their group bound (pose magnitudes beyond the
    envelope) clamp to the window edge and mis-sample — see
    ops/pallas_warp2d.py; raise ``warp2d_tz_env`` (cost grows linearly)
    to widen the exact envelope.
    """
    from planedepth_tpu.geometry import (
        build_plane_volume,
        identity_norm_grid,
    )
    from planedepth_tpu.geometry.pose import (
        transformation_from_parameters,
    )

    # the plan is usually requested DURING a jit trace (the loss builds
    # it lazily); under omnistaging every jnp op would be staged into the
    # traced graph and np.asarray below would fail on tracers — force
    # eager compile-time evaluation (all inputs are static)
    with jax.ensure_compile_time_eval():
        return _warp2d_plan_eval(
            plane_cfg, warp_type, H, W, rows, tz_env, aug_margin,
            n_groups, sx_floor, sy_floor, sx_cap, sy_cap,
            build_plane_volume, identity_norm_grid,
            transformation_from_parameters, temporal,
        )


def _warp2d_plan_eval(
    plane_cfg, warp_type, H, W, rows, tz_env, aug_margin, n_groups,
    sx_floor, sy_floor, sx_cap, sy_cap,
    build_plane_volume, identity_norm_grid,
    transformation_from_parameters, temporal=True,
):
    grid = jnp.broadcast_to(identity_norm_grid(H, W)[None], (1, H, W, 2))
    vol = build_plane_volume(grid, plane_cfg, W)
    K = np.array(
        [[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)[None]
    inv_K = np.linalg.pinv(K[0])[None].astype(np.float32)
    N = vol.disp_layered.shape[-1]

    sx_need = np.zeros(N, np.int64)
    sy_need = np.zeros(N, np.int64)
    if warp_type == "disp_warp":
        # stereo disparity warp (the render_probability / yz rescue
        # path): dx = ±disp_layered, dy = 0 — probe the disparity field
        # itself; the temporal sides of a mixed recipe are covered by
        # the depth_warp envelope probe below
        dxs = jnp.moveaxis(vol.disp_layered, -1, 1).astype(F32)
        pm = jnp.moveaxis(vol.padding_mask, -1, 1).astype(F32)
        dx, dy, _ = prepare_coords(dxs, jnp.zeros_like(dxs), pm, H, W,
                                   rows=rows)
        sx_need = np.maximum(sx_need, _tile_spreads(np.asarray(dx), rows))
        sy_need = np.maximum(sy_need, _tile_spreads(np.asarray(dy), rows))
    jit = 0.01                                   # lateral/rotation jitter
    # pure-stereo disp_warp rescue: no temporal sides -> no pose envelope
    # (the pose probe would inflate sy by fake ego-motion)
    envelopes = () if (warp_type == "disp_warp" and not temporal) \
        else (tz_env, -tz_env)
    for tz in envelopes:
        aa = jnp.asarray(np.full((1, 1, 3), jit, np.float32))
        t = jnp.asarray(np.array([[[jit, -jit, tz]]], np.float32))
        T = transformation_from_parameters(aa[:, 0][:, None],
                                           t[:, 0][:, None])
        if warp_type == "homography_warp":
            coords, pmask = homography_warp_coords(
                vol.distance, vol.normal, T, jnp.asarray(K),
                jnp.asarray(inv_K), H, W)
        else:
            coords = depth_warp_coords(
                vol.disp_layered, T, jnp.asarray(K), jnp.asarray(inv_K), W)
            pmask = jnp.moveaxis(vol.padding_mask, -1, 1)
        dx, dy = _coords_to_disp(coords.astype(F32), H, W)
        dx, dy, _ = prepare_coords(dx, dy, pmask.astype(F32), H, W,
                                   rows=rows)
        sx_need = np.maximum(sx_need, _tile_spreads(np.asarray(dx), rows))
        sy_need = np.maximum(sy_need, _tile_spreads(np.asarray(dy), rows))

    sx_need = np.clip(
        np.ceil(sx_need * aug_margin).astype(np.int64) + 2,
        sx_floor, sx_cap)
    sy_need = np.clip(
        np.ceil(sy_need * aug_margin).astype(np.int64) + 1,
        sy_floor, sy_cap)

    # DP over contiguous partitions: cost of [i, j) is
    # (j - i) * (max sx + 2) * (max sy + 2)
    def range_cost(i, j):
        return (j - i) * (int(sx_need[i:j].max()) + 2) * (
            int(sy_need[i:j].max()) + 2)

    best = {(0, 0): (0, ())}
    for g in range(1, n_groups + 1):
        for j in range(1, N + 1):
            cands = []
            for i in range(j):
                prev = best.get((g - 1, i))
                if prev is not None:
                    cands.append((prev[0] + range_cost(i, j),
                                  prev[1] + ((i, j),)))
            if cands:
                cur = min(cands)
                old = best.get((g, j))
                if old is None or cur[0] < old[0]:
                    best[(g, j)] = cur
    _, ranges = best[(n_groups, N)]
    return tuple(
        (i, j - i, int(sx_need[i:j].max()), int(sy_need[i:j].max()))
        for i, j in ranges if j > i
    )


def _side_coords(cfg, outputs, side, poses, K, inv_K, H, W):
    """(dx, dy, mask) ``(B, N, H, W)`` for one target side."""
    if cfg.warp_type == "disp_warp" and side in ("l", "r"):
        # stereo disparity warp = the dx-only special case (the rescue
        # path for render_probability / yz configs; reference
        # trainer.py:545-548)
        dx = disp_warp_shift(outputs["disp_layered"], side).astype(F32)
        return (dx, jnp.zeros_like(dx),
                jnp.moveaxis(outputs["padding_mask"], -1, 1).astype(F32))
    if cfg.warp_type == "homography_warp":
        coords, mask = homography_warp_coords(
            outputs["distance"], outputs["norm"], poses[side], K, inv_K,
            H, W,
        )
    else:                                   # depth_warp
        coords = depth_warp_coords(
            outputs["disp_layered"], poses[side], K, inv_K, W
        )
        mask = jnp.moveaxis(outputs["padding_mask"], -1, 1)
    dx, dy = _coords_to_disp(coords.astype(F32), H, W)
    return dx, dy, mask.astype(F32)


def fused_warp2d_losses(
    bundle, cfg: TrainConfig, outputs: Dict, batch: Dict, poses: Dict,
    pc_params, sides=None, include_smooth: bool = True,
) -> Dict:
    """Loss dict for the 2-D-warp target sides via the warp2d kernel —
    the plane-first twin of compute_losses (train/losses.py), including
    the reference's sum-over-sides and once-per-side self-distillation
    quirks.

    ``sides``/``include_smooth`` serve the MIXED disp_warp mode
    (train/step.py:fused_mixed_ok): stereo side 'r' rides the fused
    sweep, the temporal sides ride this kernel with the smoothness term
    left to the stereo part (the reference computes it once outside the
    side loop, trainer.py:768-771)."""
    interpret = jax.default_backend() != "tpu"
    if sides is None:
        sides = cfg.target_sides
    color_name = "color_aug" if cfg.loss.match_aug else "color"
    source = batch[f"{color_name}_l"]                     # (B, H, W, 3)
    B, H, W, _ = source.shape
    mix = cfg.model.use_mixture_loss
    in_dtype = jnp.bfloat16 if (cfg.bf16 or cfg.warp_sample_bf16) else F32

    src_t = jnp.moveaxis(source, -1, 1).astype(in_dtype)
    logits_t = jnp.moveaxis(outputs["logits"], -1, 1)     # (B, N, H, W)
    N = logits_t.shape[1]
    if mix:
        sigma_t = jnp.moveaxis(outputs["sigma"], -1, 1)
        ls = jnp.stack([logits_t, sigma_t], 2).reshape(B, 2 * N, H, W)
    else:
        ls = logits_t
    ls = ls.astype(in_dtype)

    # static plane-group tap plan: near planes zoom harder under the
    # motion envelope, so they get wider (costlier) tap windows while the
    # far-plane bulk stays cheap (see warp2d_plan)
    if cfg.warp2d_groups > 0:
        plan = warp2d_plan(
            cfg.model.planes, cfg.warp_type, H, W, cfg.sweep_rows,
            cfg.warp2d_tz_env, cfg.warp2d_aug_margin, cfg.warp2d_groups,
            4, 2, cfg.warp2d_sx_cap, cfg.warp2d_sy_cap,
            temporal=len(cfg.novel_frame_ids) > 0,
        )
    else:
        plan = ((0, N, cfg.warp2d_sx, cfg.warp2d_sy),)

    def make_sampler(sx, sy):
        return shard_kernel(
            lambda s_, l_, dx_, dy_, m_: warp2d_sample(
                s_, l_, dx_, dy_, m_, cfg.sweep_rows, sx, sy, mix,
                interpret,
            ),
            in_rows=(None, None, None, None, None),  # batch-only sharding:
            out_rows=(None, None) + ((None,) if mix else ()),  # vert halos
        )

    samplers = [make_sampler(sx, sy) for (_, _, sx, sy) in plan]
    cs = 2 if mix else 1

    def sampler(src_t, ls, dx, dy, pmask):
        outs = [
            smp(src_t, ls[:, cs * s0 : cs * (s0 + n)],
                dx[:, s0 : s0 + n], dy[:, s0 : s0 + n],
                pmask[:, s0 : s0 + n])
            for (s0, n, _, _), smp in zip(plan, samplers)
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate(parts, axis=1) for parts in zip(*outs)
        )

    mask_novel = outputs.get("mask_novel")    # (B, H, W, 1) or None
    mn_t = (
        jnp.moveaxis(mask_novel, -1, 1) if mask_novel is not None else None
    )

    losses: Dict = {"loss/ph_loss": 0.0, "loss/pc_loss": 0.0,
                    "loss/total_loss": 0.0}
    pc_apply = bundle.pc_apply(pc_params)

    for side in sides:
        target = batch[f"{color_name}_{side}"]            # (B, H, W, 3)
        tgt_t = jnp.moveaxis(target, -1, 1).astype(F32)   # (B, 3, H, W)
        dx, dy, pmask = _side_coords(
            cfg, outputs, side, poses, batch["K"], batch["inv_K"], H, W)

        sampled = sampler(src_t, ls, dx, dy, pmask)
        rgb_l = sampled[0].astype(F32)                    # (B, N, 3, H, W)
        logit_rec = sampled[1].astype(F32)                # (B, N, H, W)

        if cfg.model.render_probability:
            # NeRF alpha compositing of the warped densities (reference
            # trainer.py:584-591 reuses the SOURCE view's dists — the
            # stereo pair shares the layered depths)
            from planedepth_tpu.models.depth_decoder import (
                render_probability_from_logits,
            )

            prob = jnp.moveaxis(
                render_probability_from_logits(
                    jnp.moveaxis(logit_rec, 1, -1)[..., : N - 1],
                    outputs["dists"],
                ),
                -1, 1,
            )
        else:
            prob = jax.nn.softmax(logit_rec, axis=1)
        if mix:
            sigma_rec = jnp.clip(sampled[2].astype(F32), 0.01, 1.0)
            pi_rec = prob
            u = prob / sigma_rec
            U = u.sum(axis=1, keepdims=True)
            weights = u * jnp.where(U > 1e-7, 1.0 / jnp.maximum(U, 1e-7),
                                    0.0)
        else:
            weights = prob
        rgb_rec = (rgb_l * weights[:, :, None]).sum(1)    # (B, 3, H, W)

        total = 0.0
        if mix:
            err = jnp.abs(rgb_l - tgt_t[:, None]).mean(2)  # (B, N, H, W)
            lap = 0.5 * jnp.exp(-err / sigma_rec) / sigma_rec
            M = (pi_rec * lap).sum(1)
            ph = -jnp.log(jnp.maximum(M, 0.0) + 1e-7)      # (B, H, W)
            if cfg.loss.automask:
                err_a = jnp.abs(
                    jnp.moveaxis(source, -1, 1).astype(F32) - tgt_t
                ).mean(1)[:, None]                         # (B, 1, H, W)
                sg_s = jax.lax.stop_gradient(sigma_rec)
                sg_p = jax.lax.stop_gradient(pi_rec)
                lap_a = 0.5 * jnp.exp(-err_a / sg_s) / sg_s
                Ma = (sg_p * lap_a).sum(1)
                ph = jnp.minimum(ph, -jnp.log(jnp.maximum(Ma, 0.0) + 1e-7))
            if mn_t is not None:
                ph = ph * mn_t[:, 0]
        else:
            pred_ph = rgb_rec
            if mn_t is not None:
                pred_ph = pred_ph * mn_t + tgt_t * (1.0 - mn_t)
            ph = jnp.abs(pred_ph - tgt_t).mean(1)          # (B, H, W)
            if cfg.loss.automask:
                ph = jnp.minimum(
                    ph,
                    jnp.abs(
                        jnp.moveaxis(source, -1, 1).astype(F32) - tgt_t
                    ).mean(1),
                )
        ph_loss = jnp.mean(ph)
        losses["loss/ph_loss"] += ph_loss
        total += ph_loss

        if pc_apply is not None:
            pred = rgb_rec
            if mn_t is not None:
                pred = pred * mn_t + tgt_t * (1.0 - mn_t)
            pc = perceptual_loss(
                pc_apply, jnp.moveaxis(pred, 1, -1), target,
                source if cfg.loss.automask else None,
                remat=cfg.pc_remat,
            )
            losses["loss/pc_loss"] += pc
            total += cfg.loss.alpha_pc * pc

        if side == "r" and cfg.loss.alpha_self > 0.0:
            # self-reconstruction (reference trainer.py:605-633): ONE
            # 3-channel per-pixel gather — XLA handles this scale fine
            # (the ~170x cliff was 315 per-plane maps)
            from planedepth_tpu.train.losses import reprojection_loss
            from planedepth_tpu.train.view_synthesis import (
                pred_self_images,
            )

            self_rec = pred_self_images(
                outputs["disp"].astype(F32), target.astype(F32),
                batch["Rt_r"], batch["K"], batch["inv_K"],
            )
            self_l = jnp.mean(
                reprojection_loss(self_rec, source, cfg.loss.use_ssim)
            )
            losses["loss/self_loss"] = self_l
            total += cfg.loss.alpha_self * self_l

        if cfg.loss.self_distillation > 0 and "disp_pp" in outputs:
            disp_loss = jnp.mean(
                jnp.abs(outputs["disp"] - outputs["disp_pp"]))
            losses["loss/disp_loss"] = disp_loss
            total += cfg.loss.self_distillation * disp_loss

        losses["loss/total_loss"] += total

    if include_smooth:
        x0 = int(0.2 * W)
        smooth = smooth_loss_disp(
            outputs["disp"][:, :, x0:, :], batch["color_l"][:, :, x0:, :],
            gamma=cfg.loss.gamma_smooth,
        )
        losses["loss/smooth_loss"] = smooth
        losses["loss/total_loss"] += cfg.loss.alpha_smooth * smooth
    return losses
