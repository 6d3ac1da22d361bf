"""The jitted train/eval steps (reference trainer.py:278-356 ``run_epoch`` /
``process_batch``), fully functional and mesh-aware.

One ``train_step`` call = the reference's per-batch work: flip_right batch
doubling (ON DEVICE — halving host->device traffic vs. the reference's CPU
concat), depth forward, pose prediction + Rc conjugation, per-plane view
synthesis, loss assembly, backward, Adam update.  BN statistics are global
batch stats: under a sharded batch XLA's SPMD partitioner inserts the
cross-replica reductions, which IS the reference's SyncBatchNorm
(trainer.py:98) without any explicit collective.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from planedepth_tpu.config import TrainConfig
from planedepth_tpu.geometry.pose import (
    apply_rc,
    rc_correction,
    transformation_from_parameters,
)
from planedepth_tpu.models.factory import DepthModel, build_depth_model
from planedepth_tpu.models.perceptual import make_perceptual_net
from planedepth_tpu.models.pose_net import PoseDecoder
from planedepth_tpu.models.resnet import ResnetPoseEncoder, encoder_channels
from planedepth_tpu.train.distill import (
    generate_post_process_disp,
    mirror_occlusion_mask,
)
from planedepth_tpu.train.flip import add_flip_right_inputs
from planedepth_tpu.train.losses import compute_depth_metrics, compute_losses
from planedepth_tpu.train.state import TrainState
from planedepth_tpu.train.view_synthesis import (
    pred_novel_images,
    pred_self_images,
)


def sweep_pad(cfg: TrainConfig) -> int:
    """Static W padding for the Pallas samplers: covers the max disparity
    incl. plane-residual overshoot; shifts are clipped to it in the kernel
    wrappers as a backstop.  ONE definition — the distillation sampler and
    the fused sweep must agree on the clipping range."""
    return int(cfg.model.planes.disp_max * 1.08) + 4


class ModelBundle:
    """Static bundle of the flax modules for one training configuration."""

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        model_cfg = cfg.model
        if fused_sweep_ok(cfg):
            # the fused loss path consumes logits/sigma through the Pallas
            # sweep, which also computes the expected-disparity head from
            # its center samples; with bf16 the train-mode heads stay bf16
            # (the kernels upcast in VMEM)
            import dataclasses

            model_cfg = dataclasses.replace(
                model_cfg, fused_sweep_loss=True,
                fused_head_bf16=cfg.bf16,
            )
        self.depth = build_depth_model(model_cfg, bf16=cfg.bf16)
        self.pose_encoder = None
        self.pose = None
        if cfg.use_pose_net:
            dtype = self.depth.dtype
            self.pose_encoder = ResnetPoseEncoder(
                cfg.model.pose_num_layers, num_input_images=2, dtype=dtype
            )
            self.pose = PoseDecoder(
                num_ch_enc=tuple(encoder_channels(cfg.model.pose_num_layers)),
                num_input_features=1,
                num_frames_to_predict_for=1,
                num_ep=cfg.model.pose_num_ep,
                dtype=dtype,
            )
        self.pc = (
            make_perceptual_net(cfg.loss.pc_net, dtype=self.depth.dtype)
            if cfg.loss.alpha_pc > 0
            else None
        )

    # --- init ---------------------------------------------------------------
    def init(self, rng, height: int, width: int):
        """Initialize all parameter collections with dummy shapes."""
        img = jnp.zeros((1, height, width, 3), jnp.float32)
        grid = jnp.zeros((1, height, width, 2), jnp.float32)
        rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        variables = self.depth.init(rngs, img, grid, train=False)
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}
        if self.pose_encoder is not None:
            pe_vars = self.pose_encoder.init(
                rngs, jnp.zeros((1, height, width, 6)), train=False
            )
            params["pose_encoder"] = pe_vars["params"]
            batch_stats["pose_encoder"] = pe_vars.get("batch_stats", {})
            feats = self.pose_encoder.apply(
                {"params": pe_vars["params"],
                 "batch_stats": pe_vars.get("batch_stats", {})},
                jnp.zeros((1, height, width, 6)),
                train=False,
            )
            pd_vars = self.pose.init(rngs, [feats], grid)
            params["pose"] = pd_vars["params"]
        pc_params = None
        if self.pc is not None:
            pc_vars = self.pc.init(rngs, img)
            pc_params = pc_vars
        return params, batch_stats, pc_params

    # --- forward helpers ----------------------------------------------------
    def depth_forward(
        self, params, batch_stats, image, grid, train: bool,
        dropout_rng=None,
    ):
        variables = {"params": params["model"],
                     "batch_stats": batch_stats["model"]}
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        if train:
            outputs, mutated = self.depth.apply(
                variables, image, grid, train=True,
                mutable=["batch_stats"], rngs=rngs,
            )
            return outputs, mutated["batch_stats"]
        return self.depth.apply(variables, image, grid, train=False), None

    def predict_poses(
        self, params, batch_stats, inputs, train: bool
    ) -> Tuple[Dict, Dict]:
        """Pose for each novel frame + Rc conjugation
        (reference trainer.py:358-402)."""
        cfg = self.cfg
        poses: Dict = {"r": inputs["Rt_r"]}
        new_stats: Dict = {}
        for f_i in cfg.novel_frame_ids:
            if not cfg.data.use_colmap:
                if f_i < 0:
                    stacked = jnp.concatenate(
                        [inputs[f"color_aug_{f_i}"], inputs["color_aug_l"]],
                        axis=-1,
                    )
                else:
                    stacked = jnp.concatenate(
                        [inputs["color_aug_l"], inputs[f"color_aug_{f_i}"]],
                        axis=-1,
                    )
                variables = {"params": params["pose_encoder"],
                             "batch_stats": batch_stats["pose_encoder"]}
                if train:
                    feats, mut = self.pose_encoder.apply(
                        variables, stacked, train=True,
                        mutable=["batch_stats"],
                    )
                    new_stats["pose_encoder"] = mut["batch_stats"]
                else:
                    feats = self.pose_encoder.apply(
                        variables, stacked, train=False
                    )
                axisangle, translation = self.pose.apply(
                    {"params": params["pose"]}, [feats], inputs["grid"]
                )
                Rt = transformation_from_parameters(
                    axisangle[:, 0], translation[:, 0], invert=(f_i < 0)
                )
            else:
                Rt = inputs[f"Rt_{f_i}"].astype(jnp.float32)
            Rc = rc_correction(inputs["grid"])
            poses[f_i] = apply_rc(Rt, Rc,
                                  rotate_translation=cfg.data.use_colmap)
        return poses, new_stats

    def pc_apply(self, pc_params) -> Optional[Callable]:
        if self.pc is None or pc_params is None:
            return None
        frozen = jax.lax.stop_gradient(pc_params)
        return lambda img, **kw: self.pc.apply(frozen, img, **kw)


def process_batch(
    bundle: ModelBundle,
    params,
    batch_stats,
    teacher,
    pc_params,
    batch: Dict[str, jnp.ndarray],
    dropout_rng,
    train: bool = True,
) -> Tuple[Dict, Dict, Dict]:
    """Forward + view synthesis + losses (reference trainer.py:325-356).

    Returns (losses, outputs, new_batch_stats).
    """
    cfg = bundle.cfg
    # stop-gradient warps (teacher disp_pp, mirror occlusion masks) route
    # through the fused Pallas sampler on TPU — XLA lane gathers lower to
    # near-scalar code there (ops/pallas_shift.py); CPU keeps XLA gathers
    pallas_spec = None
    if jax.default_backend() == "tpu" and cfg.model.planes.yz_levels == 0:
        pallas_spec = (
            sweep_pad(cfg),
            cfg.model.planes.disp_levels,
            False,
        )

    if cfg.flip_right:
        batch = add_flip_right_inputs(batch, cfg.novel_frame_ids)

    outputs, new_model_stats = bundle.depth_forward(
        params, batch_stats, batch["color_aug_l"], batch["grid"], train,
        dropout_rng,
    )
    new_stats = dict(batch_stats)
    if new_model_stats is not None:
        new_stats["model"] = new_model_stats

    poses, pose_stats = bundle.predict_poses(params, batch_stats, batch, train)
    new_stats.update(pose_stats)

    color_name = "color_aug" if cfg.loss.match_aug else "color"

    if cfg.loss.self_distillation > 0.0 and teacher is not None:
        def teacher_apply(image, grid):
            return bundle.depth.apply(
                {"params": teacher["params"]["model"],
                 "batch_stats": teacher["batch_stats"]["model"]},
                image, grid, train=False,
            )

        # the teacher consumes the (possibly flip-doubled) batch directly,
        # exactly like the reference (add_flip_right_inputs runs BEFORE
        # process_batch, trainer.py:294 vs 404) — disp_pp/mask_novel come
        # back already sized like the student outputs
        disp_pp, mask_novel = generate_post_process_disp(
            teacher_apply, batch["color_aug_l"], batch["grid"],
            cfg.model.num_ep, pallas_spec=pallas_spec,
        )
        outputs["disp_pp"] = disp_pp
        outputs["mask_novel"] = mask_novel

    if (cfg.loss.use_mom and cfg.flip_right
            and (fused_sweep_ok(cfg) or fused_mixed_ok(cfg))):
        # mirror occlusion mask on the fused path: stop-grad, rebuilt from
        # the plane heads with the forward-only Pallas shift sampler
        # (overwrites the distillation mask_novel exactly like the oracle
        # branch below / reference trainer.py:344-349 ordering)
        from planedepth_tpu.train.distill import fused_mom_mask_novel

        outputs["mask_novel"] = fused_mom_mask_novel(
            outputs, cfg.model.use_mixture_loss, pallas_spec
        )

    if fused_sweep_ok(cfg):
        losses = fused_stereo_losses(bundle, cfg, outputs, batch, pc_params)
        return losses, outputs, new_stats

    from planedepth_tpu.train.mono import fused_warp2d_losses, fused_warp2d_ok

    if fused_warp2d_ok(cfg):
        losses = fused_warp2d_losses(
            bundle, cfg, outputs, batch, poses, pc_params
        )
        return losses, outputs, new_stats

    if fused_mixed_ok(cfg):
        # stereo side 'r' rides the fused sweep (incl. the smoothness
        # term, computed once like the reference's outside-the-side-loop
        # placement); the temporal sides ride the warp2d kernel.  Loss
        # keys sum exactly as the reference's per-side loop does.
        losses = fused_stereo_losses(bundle, cfg, outputs, batch, pc_params)
        extra = fused_warp2d_losses(
            bundle, cfg, outputs, batch, poses, pc_params,
            sides=tuple(cfg.novel_frame_ids), include_smooth=False,
        )
        for k, v in extra.items():
            if k == "loss/disp_loss":
                # same value every side; the per-side total additions
                # are already inside each part's total_loss
                losses[k] = v
            else:
                losses[k] = losses.get(k, 0.0) + v
        return losses, outputs, new_stats

    def synth_and_losses(outputs, batch):
        """View synthesis + loss assembly.

        Under ``cfg.remat_warp`` this whole segment is rematerialized in the
        backward pass: the (B, N, H, W, C) plane stacks are never stored
        between forward and backward, cutting the dominant activation
        footprint at HR resolutions.
        """
        rec = pred_novel_images(
            outputs,
            batch[f"{color_name}_l"],
            cfg.target_sides,
            poses,
            batch["K"],
            batch["inv_K"],
            warp_type=cfg.warp_type,
            use_mixture_loss=cfg.model.use_mixture_loss,
            render_probability=cfg.model.render_probability,
            rowshift=cfg.rowshift_warp,
            sample_dtype=jnp.bfloat16 if cfg.warp_sample_bf16 else None,
        )
        if cfg.loss.use_mom and cfg.flip_right:
            outputs = dict(outputs)
            outputs["mask_novel"] = mirror_occlusion_mask(
                outputs, rec, pallas_spec=pallas_spec
            )
        if cfg.loss.alpha_self > 0.0:
            for side in cfg.target_sides:
                if side == "r":
                    rec[("self_rec", side)] = pred_self_images(
                        outputs["disp"], batch[f"{color_name}_r"],
                        batch["Rt_r"], batch["K"], batch["inv_K"],
                    )
        return compute_losses(
            cfg.loss,
            cfg.target_sides,
            batch,
            outputs,
            rec,
            bundle.pc_apply(pc_params),
            alpha_pc=cfg.loss.alpha_pc,
            alpha_smooth=cfg.loss.alpha_smooth,
            gamma_smooth=cfg.loss.gamma_smooth,
            alpha_self=cfg.loss.alpha_self,
            self_distillation=cfg.loss.self_distillation,
            automask=cfg.loss.automask,
            use_mixture_loss=cfg.model.use_mixture_loss,
        )

    if cfg.remat_warp:
        synth_and_losses = jax.checkpoint(synth_and_losses)
    losses = synth_and_losses(outputs, batch)
    return losses, outputs, new_stats


def fused_sweep_ok(cfg: TrainConfig) -> bool:
    """True when the training mode is covered by the fused Pallas sweep.

    The fused kernel is THE production TPU path: on v5e it measures ~170x
    faster than the XLA-gather oracle (0.072 imgs/s/chip vs ~12,
    PERF_NOTES.md) because XLA lowers lane-dimension gathers to
    near-scalar TPU code.  Everything outside this predicate (monocular
    ``homography_warp``/``depth_warp`` -> warp2d kernel; render_probability,
    yz planes, extra target sides -> oracle) is handled elsewhere; use_mom
    rides this path via the stop-grad Pallas shift sampler
    (train/distill.py fused_mom_mask_novel); alpha_self rides it with the
    self-reconstruction as a single-map XLA gather (3 channel-maps at the
    expected disparity — NOT the 315 per-plane maps the 170x cliff was
    measured on).
    """
    return (
        cfg.fused_sweep
        and cfg.warp_type == "disp_warp"
        # use_mixture_loss=False (FalNet / L1-on-composite ablations)
        # rides the LOGITS-ONLY no-mixture kernel variant
        # (ops/pallas_sweep.fused_plane_sweep_nomix)
        and not cfg.model.render_probability
        and cfg.model.planes.yz_levels == 0
        and tuple(cfg.target_sides) == ("r",)
    )


def fused_mixed_ok(cfg: TrainConfig) -> bool:
    """True for stereo + temporal ``disp_warp`` configs (the reference's
    mono+stereo recipe shape, trainer.py:85-88): side 'r' rides the fused
    sweep, the temporal sides ride the warp2d kernel."""
    return (
        cfg.fused_sweep
        and cfg.warp_type == "disp_warp"
        and not cfg.model.render_probability
        and cfg.model.planes.yz_levels == 0
        and not cfg.no_stereo
        and len(cfg.novel_frame_ids) > 0
    )


def fused_stereo_losses(bundle, cfg, outputs, batch, pc_params):
    """Stage-1/HR/SD stereo loss path via the fused Pallas plane sweep.

    Semantically identical to the oracle (tested in
    tests/test_pallas_sweep.py): photometric mixture NLL with optional
    automask min and mask_novel, perceptual on the composited
    reconstruction, self-distillation L1, edge-aware smoothness.
    """
    from planedepth_tpu.ops.losses import smooth_loss_disp
    from planedepth_tpu.ops.pallas_sweep import (
        fused_plane_sweep, fused_plane_sweep_packed,
    )
    from planedepth_tpu.train.losses import perceptual_loss

    color_name = "color_aug" if cfg.loss.match_aug else "color"
    source = batch[f"{color_name}_l"]
    target = batch[f"{color_name}_r"]

    pad = sweep_pad(cfg)

    in_dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    packed = "ls_s2d" in outputs

    def plane_first(x4):
        """Phase-packed (B, H/2, W/2, 4n) head -> plane-first (B, n, H, W)."""
        Bq, Hh, Wh, C4 = x4.shape
        n = C4 // 4
        x = x4.astype(in_dtype).reshape(Bq, Hh, Wh, 2, 2, n)
        return x.transpose(0, 5, 1, 3, 2, 4).reshape(Bq, n, 2 * Hh, 2 * Wh)

    def v1_operands():
        """Channel/plane-first full-res operands for the v1 kernels.

        With the s2d merged head (decoder interleaved dispconv/sigmaconv
        channels at the weight level) ONE transpose builds the
        (B, 2N, H, W) `ls` operand.  The quad kernel path skips all of
        this — it consumes the s2d layout directly.

        No-mixture recipes (FalNet, use_mixture_loss=False ablations)
        have no sigma head: the LOGITS-ONLY no-mixture kernel variant
        (ops/pallas_sweep.fused_plane_sweep_nomix) takes just the logits
        operand and uses sigma == 1 internally."""
        src_t = jnp.moveaxis(source.astype(in_dtype), -1, 1)
        tgt_t = jnp.moveaxis(target.astype(in_dtype), -1, 1)
        if packed:
            # the decoder emits the merged head RAW (conv without bias);
            # the bias add + mixture sigma epilogue ride here (XLA) on
            # the v1 path, in the relayout kernel on the quad path
            from planedepth_tpu.ops.pallas_sweep_quad import ls_epilogue

            heads = (plane_first(ls_epilogue(
                outputs["ls_s2d"], outputs.get("ls_bias"))),)
        elif not cfg.model.use_mixture_loss:
            heads = (jnp.moveaxis(outputs["logits"].astype(in_dtype), -1, 1),)
        else:
            heads = (
                jnp.moveaxis(outputs["logits"].astype(in_dtype), -1, 1),
                jnp.moveaxis(outputs["sigma"].astype(in_dtype), -1, 1),
            )
        return src_t, tgt_t, heads

    interpret = jax.default_backend() != "tpu"   # CPU tests: interpret mode

    shift = outputs["disp_rows"]                    # target 'r': x + disp
    mask_rows = outputs["padding_mask"][:, :, 0, :]
    # under a GSPMD mesh the pallas_call must be shard_mapped over the
    # batch (and spatial) axes — plain jit would all-gather + replicate it
    # on every device (parallel/shard.py)
    from planedepth_tpu.parallel.shard import shard_kernel

    n_vertical = cfg.model.planes.disp_levels  # vertical: row-vectorized
    # with_disp: the kernel also emits the expected-disparity head from
    # its center samples whenever the decoder skipped it (bf16 fused
    # training — models/depth_decoder.py)
    with_disp = "disp" not in outputs
    # quad path: the phase-split kernel consumes the s2d head layout
    # directly (ops/pallas_sweep_quad.py) — no full-res plane-first
    # repack copies anywhere in the step
    use_quad = (
        packed
        and cfg.sweep_quad
        and cfg.sweep_gp_taps_quad > 0
        and (source.shape[1] // 2) % cfg.sweep_rows == 0
        # Mosaic's dynamic_rotate requires the half-res window (W/2 + 128
        # halo) to be lane-aligned; at W % 256 != 0 (e.g. stage-1 low-res
        # 640: W/2 = 320 -> 448-wide windows) the quad kernel fails to
        # compile on real TPU.  Fall back to the packed v1 kernel, whose
        # full-res windows are aligned for any W % 128 == 0.  Interpret
        # mode (CPU tests, multichip dryrun) has no alignment constraint;
        # sweep_quad_strict_align applies the guard there too so a dryrun
        # traces the same kernel selection as hardware.
        and ((interpret and not cfg.sweep_quad_strict_align)
             or source.shape[2] % 256 == 0)
    )
    if use_quad:
        from planedepth_tpu.ops import pallas_sweep_quad as psq

        # NHWC head straight into the kernel wrapper: ONE Pallas relayout
        # pass builds the padded NCHW operand (ops/pallas_relayout.py)
        # instead of the XLA transpose + pad copies (9.3 + 4.2 ms/step in
        # the r4 trace), and the cotangent comes back NHWC the same way
        ls_s2d = outputs["ls_s2d"].astype(in_dtype)
        srcq = psq.s2d_image(source, in_dtype)
        tgtq = psq.s2d_image(target, in_dtype)
        # sigma_epilogue: the head is RAW (models/depth_decoder.py); the
        # mixture sigma sigmoid+clip runs inside the relayout pass —
        # every XLA placement of it (decoder epilogue, pack site) ran as
        # a standalone full-res clamp_select between two layout copies
        # (~11 ms/step, r5 trace).  nonneg: shifts are
        # disparities (>= 0), so the kernel operands skip the left halo.
        # with_auto only when the recipe automasks — otherwise the kernel
        # skips the automask mixture (one exp per plane per pixel).
        with_auto = cfg.loss.automask
        # nonneg is correct-by-construction: fused_stereo_losses only
        # ever serves target side 'r' (fused_sweep_ok / fused_mixed_ok),
        # whose shifts are disparities >= 0
        nonneg = True
        ls_bias = outputs["ls_bias"].astype(in_dtype)
        sweep = shard_kernel(
            lambda s_, t_, l_, sh_, m_, b_: psq.fused_plane_sweep_quad_s2d(
                s_, t_, l_, sh_, m_, b_,
                pad, interpret, n_vertical, with_disp,
                # NOT cfg.sweep_gp_taps: quad blocks span 2*sweep_rows
                # full-res rows, needing the 16-row spread bound (14)
                2 * cfg.sweep_rows, cfg.sweep_gp_taps_quad, with_auto,
                nonneg, True,
            ),
            in_rows=(2, 2, 1, 2, 2, "rep"),
            out_rows=(2, 2) + ((2,) if with_auto else ())
            + ((2,) if with_disp else ()),
            row_block=cfg.sweep_rows,
        )
        sweep_out = sweep(srcq, tgtq, ls_s2d, psq.split_rows(shift),
                          psq.split_rows(mask_rows), ls_bias)
        nll = sweep_out[1]                             # (B, 4, H/2, W/2)
        nll_auto = sweep_out[2] if with_auto else None
        rgb_rec = psq.d2s_quad(sweep_out[0])           # (B, H, W, 3)
        dispq = sweep_out[-1] if with_disp else None   # (B, 4, H/2, W/2)
        if with_disp:
            disp = psq.d2s_quad(dispq)                 # (B, H, W, 1)
        else:
            disp = outputs["disp"]
    else:
        src_t, tgt_t, head_operands = v1_operands()
        # no-mixture: the kernel's nll/nll_auto are mixture quantities —
        # the L1 photometric (and its automask) is assembled OUTSIDE from
        # the composite, so the kernel skips the automask mixture
        with_auto = cfg.loss.automask and cfg.model.use_mixture_loss
        nonneg = True                                # see quad branch
        if not cfg.model.use_mixture_loss:
            from planedepth_tpu.ops.pallas_sweep import (
                fused_plane_sweep_nomix,
            )

            fps = lambda *a: fused_plane_sweep_nomix(
                *a, pad, interpret, n_vertical, with_disp,
                cfg.sweep_rows, cfg.sweep_gp_taps, nonneg,
            )
        elif packed:
            fps = lambda *a: fused_plane_sweep_packed(
                *a, pad, interpret, n_vertical,
                False,               # image_grads: images are never diffed
                with_disp, cfg.sweep_rows, cfg.sweep_gp_taps, with_auto,
                nonneg,
            )
        else:
            fps = lambda *a: fused_plane_sweep(
                *a, pad, interpret, n_vertical,
                False,               # image_grads: images are never diffed
                with_disp, cfg.sweep_rows, cfg.sweep_gp_taps, with_auto,
                nonneg,
            )
        sweep = shard_kernel(
            fps,
            in_rows=(2, 2) + (2,) * len(head_operands) + (1, 1),
            out_rows=(2, 1) + ((1,) if with_auto else ())
            + ((1,) if with_disp else ()),
            row_block=cfg.sweep_rows,
        )
        sweep_out = sweep(src_t, tgt_t, *head_operands, shift, mask_rows)
        rgb_t, nll = sweep_out[:2]
        nll = nll[..., None]
        nll_auto = sweep_out[2][..., None] if with_auto else None
        if with_disp:
            disp = sweep_out[-1][..., None]          # (B, H, W, 1)
        else:
            disp = outputs["disp"]
        rgb_rec = jnp.moveaxis(rgb_t, 1, -1)

    mask_novel = outputs.get("mask_novel")
    if cfg.model.use_mixture_loss:
        ph = nll
        if cfg.loss.automask:
            ph = jnp.minimum(ph, nll_auto)
        if mask_novel is not None:
            if use_quad:
                from planedepth_tpu.ops.pallas_sweep_quad import s2d_image

                ph = ph * s2d_image(mask_novel, ph.dtype)
            else:
                ph = ph * mask_novel
        ph_loss = jnp.mean(ph)
    else:
        # L1 on the composite (reference trainer.py:738 via
        # compute_losses), with the mask_novel blend and automask min
        # applied exactly as the oracle does (train/losses.py:119-154)
        pred_ph = rgb_rec.astype(jnp.float32)
        if mask_novel is not None:
            pred_ph = pred_ph * mask_novel + target * (1.0 - mask_novel)
        ph = jnp.mean(jnp.abs(pred_ph - target), axis=-1, keepdims=True)
        if cfg.loss.automask:
            ph = jnp.minimum(
                ph,
                jnp.mean(jnp.abs(source - target), axis=-1, keepdims=True),
            )
        ph_loss = jnp.mean(ph)

    losses = {"loss/ph_loss": ph_loss, "loss/pc_loss": 0.0}
    total = ph_loss

    pc_apply = bundle.pc_apply(pc_params)
    if pc_apply is not None:
        packed_pc = use_quad and cfg.pc_s2d and cfg.loss.pc_net == "vgg19"
        if packed_pc:
            # feed the VGG the phase-split tensors directly: the sweep
            # kernel's rgb output and the already-packed target/source
            # (exact packed conv1_1) — no full-res C=3 round trip
            predq = sweep_out[0]
            if mask_novel is not None:
                mq = jnp.repeat(
                    psq.s2d_image(mask_novel, predq.dtype), 3, axis=1)
                predq = predq * mq + tgtq.astype(predq.dtype) * (1.0 - mq)
            to_nhwc = lambda t: jnp.moveaxis(t, 1, -1)
            pc = perceptual_loss(
                pc_apply, to_nhwc(predq), to_nhwc(tgtq),
                to_nhwc(srcq) if cfg.loss.automask else None,
                remat=cfg.pc_remat, packed=True,
            )
        else:
            # photometric mask_novel blend applies to the perceptual
            # input too
            pred = rgb_rec
            if mask_novel is not None:
                pred = pred * mask_novel + target * (1.0 - mask_novel)
            pc = perceptual_loss(
                pc_apply, pred, target,
                source if cfg.loss.automask else None,
                remat=cfg.pc_remat,
            )
        losses["loss/pc_loss"] = pc
        total += cfg.loss.alpha_pc * pc

    if cfg.loss.alpha_self > 0.0:
        # self-reconstruction (reference trainer.py:605-633): resample
        # the RIGHT image at the expected disparity and compare to the
        # left.  ONE 3-channel per-pixel gather (~6M samples at stage-1
        # shapes) — the XLA-gather path is fine at this scale; the ~170x
        # cliff (PERF_NOTES.md) was measured on 315 per-plane maps.
        from planedepth_tpu.train.losses import reprojection_loss
        from planedepth_tpu.train.view_synthesis import pred_self_images

        self_rec = pred_self_images(
            disp.astype(jnp.float32), target.astype(jnp.float32),
            batch["Rt_r"], batch["K"], batch["inv_K"],
        )
        self_l = jnp.mean(
            reprojection_loss(self_rec, source, cfg.loss.use_ssim)
        )
        losses["loss/self_loss"] = self_l
        total += cfg.loss.alpha_self * self_l

    if cfg.loss.self_distillation > 0 and "disp_pp" in outputs:
        disp_loss = jnp.mean(jnp.abs(disp - outputs["disp_pp"]))
        losses["loss/disp_loss"] = disp_loss
        total += cfg.loss.self_distillation * disp_loss

    W = source.shape[2]
    x0 = int(0.2 * W)
    if use_quad and with_disp and x0 % 2 == 0:
        # phase-domain smoothness: no full-res f32 disparity chain in the
        # step (exact same pixel pairs; ops/losses.py)
        from planedepth_tpu.ops.losses import smooth_loss_disp_quad

        iq = (srcq if color_name == "color"
              else psq.s2d_image(batch["color_l"], in_dtype))
        w0 = x0 // 2
        smooth = smooth_loss_disp_quad(
            dispq[:, :, :, w0:], iq[:, :, :, w0:],
            gamma=cfg.loss.gamma_smooth,
        )
    else:
        smooth = smooth_loss_disp(
            disp[:, :, x0:, :], batch["color_l"][:, :, x0:, :],
            gamma=cfg.loss.gamma_smooth,
        )
    losses["loss/smooth_loss"] = smooth
    losses["loss/total_loss"] = total + cfg.loss.alpha_smooth * smooth
    return losses


def make_train_step(bundle: ModelBundle, tx) -> Callable:
    """Build the jittable train step for a static config + optimizer."""

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            losses, outputs, new_stats = process_batch(
                bundle, params, state.batch_stats, state.teacher,
                state.pc_params, batch, dropout_rng, train=True,
            )
            return losses["loss/total_loss"], (losses, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {k: v for k, v in losses.items()}
        return new_state, metrics

    return train_step


def make_eval_step(bundle: ModelBundle) -> Callable:
    """Validation forward + depth metrics (reference trainer.py:468-508).

    Metric reduction across devices comes free: the weighted sums inside
    ``compute_depth_metrics`` are global reductions over the sharded batch,
    which XLA lowers to the same all-reduce the reference issues explicitly
    (trainer.py:504-508).
    """
    cfg = bundle.cfg

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        outputs, _ = bundle.depth_forward(
            state.params, state.batch_stats, batch["color_aug_l"],
            batch["grid"], train=False,
        )
        return compute_depth_metrics(
            outputs["depth"], batch["depth_gt_l"], batch["grid"],
            stereo_scale=not cfg.no_stereo,
        )

    return eval_step
