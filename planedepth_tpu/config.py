"""Typed configuration for PlaneDepth-TPU.

Replaces the reference's flat argparse namespace (reference: options.py:17-293)
with frozen dataclasses.  Every flag of the reference's capability surface
(SURVEY.md §2.3) has a field here; the three training-stage recipes of the
reference README are provided as presets.

Unlike the reference we keep the config immutable: derived quantities
(e.g. per-host batch size under flip_right, reference trainer.py:77-78) are
computed in properties instead of mutating the parsed namespace.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class PlaneConfig:
    """Plane-volume layout (reference: networks/depth_decoder.py:18-52)."""

    disp_levels: int = 49           # vertical (fronto-parallel, "no") planes
    disp_min: float = 2.0
    disp_max: float = 300.0
    xz_levels: int = 14             # ground planes
    xz_min: float = 0.1852
    xz_max: float = 0.3704
    yz_levels: int = 0              # side planes (2 x yz_levels//2)
    yz_min: float = 0.1
    yz_max: float = 10.0

    def __post_init__(self):
        # degenerate counts silently produce NaN spacings (divisions by
        # levels-1 in geometry/planes.py) or shape errors — reject early
        assert self.disp_levels >= 2, "disp_levels must be >= 2"
        assert self.xz_levels == 0 or self.xz_levels >= 2, \
            "xz_levels must be 0 or >= 2"
        assert self.yz_levels % 2 == 0 and self.yz_levels != 2, \
            "yz_levels must be even and 0 or >= 4 (two half-sets with " \
            ">= 2 levels each)"

    @property
    def all_levels(self) -> int:
        return self.disp_levels + self.xz_levels + self.yz_levels


@dataclass(frozen=True)
class ModelConfig:
    """Network architecture selection (reference: options.py:99-163)."""

    net_type: str = "ResNet"        # ResNet | PladeNet | FalNet
    num_layers: int = 50            # resnet depth: 18/34/50/101/152
    num_ep: int = 8                 # positional-encoding channels
    pe_type: str = "neural"         # neural | frequency
    use_denseaspp: bool = True
    use_mixture_loss: bool = True
    plane_residual: bool = True
    render_probability: bool = False
    # rematerialize encoder residual blocks in the backward pass (trade
    # ~30% backward FLOPs for the conv activation footprint at HR)
    remat: bool = False
    # fused Pallas expected-disparity head (ops/pallas_disp.py):
    # "auto" = on TPU backends, "off" = always XLA chain,
    # "interpret" = force the kernel in interpret mode (CPU mesh tests)
    fused_head: str = "auto"
    # keep the plane heads (logits/sigma) in the compute dtype during
    # training instead of f32 — set by ModelBundle when the fused Pallas
    # loss path is active (the kernels upcast in VMEM; f32 would only add
    # ~2 GB of HBM tensors + transposes per HR step)
    fused_head_bf16: bool = False
    # the fused Pallas SWEEP computes the expected-disparity head from its
    # center samples (ops/pallas_sweep.py with_disp) — set by ModelBundle
    # whenever the fused loss path is active; the decoder then emits no
    # disp/depth in train mode
    fused_sweep_loss: bool = False
    # space-to-depth decoder tail (models/s2d.py): run the finest decoder
    # scale phase-packed so no (H, W, 16) tensor — 8x lane-padded on TPU —
    # ever materializes.  "auto" = TPU backends, "on"/"off" force.
    s2d_tail: str = "auto"
    # space-to-depth encoder stem (models/s2d.py:stem_s2d_kernel): the
    # 7x7/2 stem conv on the 2-level packed input.  Default OFF: measured
    # on v5e (BENCH r3c vs r3b) it REGRESSES the full step ~4% — the raw
    # image keeps its C-minor layout anyway because the perceptual VGG
    # stem and the sweep-kernel transposes also consume it, so the
    # packing ops add cost without removing the padded layout.  Kept as
    # an option for image-single-consumer configurations.
    s2d_stem: str = "off"
    planes: PlaneConfig = field(default_factory=PlaneConfig)
    # Pose network (only built when novel_frame_ids non-empty and not colmap,
    # reference trainer.py:92-94)
    pose_num_layers: int = 18
    pose_num_ep: int = 8


@dataclass(frozen=True)
class LossConfig:
    """Loss weights and switches (reference: options.py:62-77,141-155,208-248)."""

    alpha_smooth: float = 0.04
    gamma_smooth: float = 2.0
    alpha_pc: float = 0.1
    alpha_self: float = 0.0
    self_distillation: float = 0.0
    automask: bool = False
    use_ssim: bool = False
    match_aug: bool = False
    pc_net: str = "vgg19"           # vgg19 | resnet18
    use_mom: bool = False           # mirror occlusion mask


@dataclass(frozen=True)
class DataConfig:
    """Dataset / augmentation (reference: options.py:27-60,113-115,156-158)."""

    data_path: str = "./kitti_data"
    dataset: str = "kitti"          # kitti | kitti_odom
    split: str = "eigen_full_left"
    height: int = 192
    width: int = 640
    png: bool = False
    no_crop: bool = False           # disables RandomResizeCrop
    use_colmap: bool = False
    colmap_path: str = "./kitti_colmap"
    # loader decode threads (reference uses 12 worker processes,
    # options.py:217-220; PIL/np release the GIL so threads scale on a
    # real TPU-VM host — see tests/test_loader_throughput.py)
    num_workers: int = 12
    # aug ranges (reference: datasets/mono_dataset.py:77-87)
    crop_factor: Tuple[float, float] = (0.75, 1.5)
    gamma_range: Tuple[float, float] = (0.8, 1.2)
    brightness_range: Tuple[float, float] = (0.5, 2.0)
    color_range: Tuple[float, float] = (0.8, 1.2)


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer schedule (reference: options.py:176-206)."""

    learning_rate: float = 1e-4
    beta_1: float = 0.5
    beta_2: float = 0.999
    num_epochs: int = 50
    milestones: Tuple[int, ...] = (30, 40)
    lr_gamma: float = 0.5
    start_epoch: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Full training configuration (reference: options.py + trainer.py)."""

    model_name: str = "planedepth"
    log_dir: str = "./log"
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)

    batch_size: int = 8             # GLOBAL batch before flip_right halving
    seed: int = 1
    warp_type: str = "disp_warp"    # depth_warp | disp_warp | homography_warp
    novel_frame_ids: Tuple[int, ...] = ()
    no_stereo: bool = False
    flip_right: bool = False

    # checkpoint / logging
    load_weights_folder: Optional[str] = None
    models_to_load: Tuple[str, ...] = ("encoder", "depth")
    # restore the Adam state saved with the checkpoint whenever it is
    # structurally compatible (reference trainer.py:905-913 always restores
    # adam.pth when present)
    restore_optimizer: bool = True
    # converted ImageNet weights (scripts/convert_torch_weights.py output):
    # resnet{num_layers}.npz for the encoder(s), vgg19/resnet18.npz for the
    # perceptual net (reference resnet_encoder.py:35, layers.py:381)
    weights_dir: Optional[str] = None
    # explicitly allow training with a RANDOM perceptual net when
    # alpha_pc > 0 (tests/ablations only; the reference always uses
    # ImageNet features)
    allow_random_pc: bool = False
    log_frequency: int = 500
    log_img_frequency: int = 250

    # parallelism
    mesh_shape: Tuple[int, ...] = ()   # () => use all devices on 1-D 'data' axis
    bf16: bool = True                  # bfloat16 activations on TPU
    # sample the warped plane stacks in bfloat16 (halves their HBM
    # footprint on the XLA-gather path)
    warp_sample_bf16: bool = False
    # rematerialize the view-synthesis + loss segment in the backward pass:
    # the (B, N, H, W, C) plane stacks are never stored between fwd and bwd
    # (XLA-gather path only)
    remat_warp: bool = False
    # checkpoint the perceptual net's pred-branch forward (train/losses.py
    # perceptual_loss): True trades one extra VGG forward per step for
    # ~2 GB of stored residuals.  Turn off when HBM allows.
    pc_remat: bool = True
    # on the quad fused path, feed the perceptual VGG the space-to-depth
    # packed images directly (exact packed conv1_1, models/perceptual.py):
    # the sweep kernel's phase-split reconstruction and the already-packed
    # target/source skip their full-res C=3 (~21x lane-padded) round trip
    pc_s2d: bool = True
    # use the row-constant custom-VJP warp (ops/rowshift.py) on the
    # XLA-gather path (scatter-free backward)
    rowshift_warp: bool = False
    # fused Pallas plane-sweep (ops/pallas_sweep.py) for the stereo
    # disp_warp + mixture-loss hot path: no warped plane stacks or gather
    # index arrays ever materialize (activation memory ~N x smaller) AND
    # no XLA lane gathers, which lower to near-scalar code on TPU.  The
    # stage presets enable this; it is THE production path on TPU.
    # (Round-1 notes claiming the XLA gather path was faster were artifacts
    # of async-dispatch timing — see bench.py's methodology note.)
    fused_sweep: bool = False
    # rows-per-block R of the sweep kernels (H must divide by it); larger
    # blocks amortize per-plane loop overhead against VMEM pressure
    sweep_rows: int = 8
    # static per-row-block integer-shift spread bound S for the
    # row-vectorized ground-plane samplers in the sweep kernels
    # (ops/pallas_sweep.py taps path).  Ground-plane disparity is linear
    # in the row, so an R-row block spans <= R * disp_bottom/H_horizon
    # integer shifts — measured worst case 6 px at the production presets
    # (tests/test_pallas_sweep.py::test_gp_spread); 8 leaves margin.
    # 0 falls back to the per-row (single-sublane) sampling path.
    sweep_gp_taps: int = 8
    # phase-split (quad) sweep kernel: when the s2d decoder tail is active
    # the kernel consumes the space-to-depth head layout DIRECTLY
    # (ops/pallas_sweep_quad.py) — the ~1 GB plane-first repack copies
    # (3 each way at HR batch 8) leave the step entirely.  Gated on
    # sweep_gp_taps_quad > 0 (the quad kernel has no per-row gp fallback);
    # falls back to the v1 kernels otherwise.  NOTE: sweep_gp_taps=0 (the
    # v1 per-row gp path) deliberately does NOT disable the quad path —
    # set sweep_quad=False to force the v1 kernels.
    sweep_quad: bool = True
    # the quad kernel's ground-plane tap bound.  Its row blocks span
    # 2*sweep_rows = 16 FULL-RES rows (Mosaic needs >= 8 half-res
    # sublanes), so the per-block integer-shift spread bound is the
    # 16-row one: measured worst case 14 px at the production presets
    # (tests/test_pallas_sweep.py::test_gp_spread's worst16).  Using the
    # 8-row bound here silently CLIPS the tap grid and mis-samples the
    # ground planes (caught by scripts/validate_sweep_tpu.py check_quad).
    sweep_gp_taps_quad: int = 14
    # apply the quad kernel's real-TPU W % 256 lane-alignment guard in
    # interpret mode too, so CPU tests / the multichip dryrun trace the
    # SAME kernel selection a real TPU would make for the given width
    # (default False: interpret mode has no alignment constraint, and the
    # small test widths stand in for the aligned production HR width)
    sweep_quad_strict_align: bool = False
    # fused 2-D warp kernel (ops/pallas_warp2d.py): the TPU path for the
    # monocular homography_warp / depth_warp modes.  Tap-window bounds
    # cover the per-tile integer displacement spread; cost is linear in
    # (sx + 2) * (sy + 2) per plane.  The spread is zoom-dominated and
    # geometric in the plane index, so the production path probes the
    # exact warp geometry at warp2d_tz_env envelope poses and
    # DP-partitions the planes into warp2d_groups contiguous ranges with
    # per-group bounds (train/mono.py:warp2d_plan) — near planes pay
    # wide windows, the far bulk stays cheap.  Poses beyond the envelope
    # clamp to the window edge (tests/test_pallas_warp2d.py pins the
    # spread statistics).
    warp2d_groups: int = 3
    # forward-motion envelope in model units (0.1 = one stereo baseline
    # = 0.54 m/frame ~ 19 km/h at KITTI's 10 Hz) the plan covers exactly
    warp2d_tz_env: float = 0.1
    # RandomResizeCrop factors up to 1.5 grow on-screen disparities
    warp2d_aug_margin: float = 1.5
    # per-group bound caps: compile time / VPU cost backstops
    warp2d_sx_cap: int = 96
    warp2d_sy_cap: int = 16
    # single-call bounds when warp2d_groups == 0 (tests/ablations)
    warp2d_sx: int = 16
    warp2d_sy: int = 8

    def __post_init__(self):
        if self.loss.use_mom and not self.flip_right:
            # reference trainer.py:74-75 forces flip_right under use_mom
            object.__setattr__(self, "flip_right", True)
        assert self.data.height % 32 == 0, "'height' must be a multiple of 32"
        assert self.data.width % 32 == 0, "'width' must be a multiple of 32"
        assert self.warp_type in ("depth_warp", "disp_warp", "homography_warp")
        assert self.model.net_type in ("ResNet", "PladeNet", "FalNet")

    # --- derived quantities -------------------------------------------------
    @property
    def per_step_batch(self) -> int:
        """Images fed to the data pipeline per optimizer step.

        Under flip_right the loaded batch is halved, then doubled by the
        flip augmentation (reference trainer.py:77-78,252-276).
        """
        return self.batch_size // 2 if self.flip_right else self.batch_size

    @property
    def effective_batch(self) -> int:
        """Batch size actually seen by the networks."""
        return self.per_step_batch * (2 if self.flip_right else 1)

    @property
    def target_sides(self) -> Tuple:
        """Warping targets: stereo right + temporal neighbors
        (reference trainer.py:85-88)."""
        sides = () if self.no_stereo else ("r",)
        return sides + tuple(self.novel_frame_ids)

    @property
    def use_pose_net(self) -> bool:
        return len(self.novel_frame_ids) > 0 and not self.data.use_colmap

    # --- serialization ------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def from_dict(d: dict) -> "TrainConfig":
        """Rebuild a TrainConfig from ``json.loads(cfg.to_json())`` (the
        opt.json / checkpoint-meta provenance format)."""
        return _dataclass_from_dict(TrainConfig, d)


def _dataclass_from_dict(cls, d: dict):
    kw = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = _FIELD_DATACLASSES.get((cls.__name__, f.name))
        if ftype is not None and isinstance(v, dict):
            kw[f.name] = _dataclass_from_dict(ftype, v)
        elif isinstance(v, list):
            kw[f.name] = tuple(v)
        elif v == "None":
            kw[f.name] = None
        else:
            kw[f.name] = v
    return cls(**kw)


# nested-dataclass fields for from_dict reconstruction
_FIELD_DATACLASSES = {
    ("TrainConfig", "model"): ModelConfig,
    ("TrainConfig", "loss"): LossConfig,
    ("TrainConfig", "data"): DataConfig,
    ("TrainConfig", "optim"): OptimConfig,
    ("ModelConfig", "planes"): PlaneConfig,
}


# ---------------------------------------------------------------------------
# Stage presets (reference README.md:36-90)
# ---------------------------------------------------------------------------

def stage1_config(**overrides) -> TrainConfig:
    """Stage 1: 640x192 stereo, 50 epochs, full feature set."""
    cfg = TrainConfig(
        model_name="stage1",
        fused_sweep=True,
        flip_right=True,
        batch_size=8,
        data=DataConfig(height=192, width=640, split="eigen_full_left"),
        optim=OptimConfig(learning_rate=1e-4, num_epochs=50, milestones=(30, 40)),
    )
    return cfg.replace(**overrides) if overrides else cfg


def hr_finetune_config(**overrides) -> TrainConfig:
    """Stage 2: 1280x384 high-resolution finetune, 1 epoch, lr 2.5e-5."""
    cfg = TrainConfig(
        model_name="hr_finetune",
        fused_sweep=True,
        flip_right=True,
        batch_size=8,
        data=DataConfig(height=384, width=1280, split="eigen_full_left",
                        no_crop=True),
        optim=OptimConfig(learning_rate=2.5e-5, num_epochs=1, milestones=()),
        models_to_load=("encoder", "depth"),
    )
    return cfg.replace(**overrides) if overrides else cfg


def self_distillation_config(**overrides) -> TrainConfig:
    """Stage 3: self-distillation with frozen teacher, 10 epochs, lr 2e-5.

    NOTE: the reference's stage-3 command drops ``--flip_right``
    (reference README.md:56-74) — the loaded batch is the full batch_size 4
    with no flip doubling.
    """
    cfg = TrainConfig(
        model_name="self_distillation",
        fused_sweep=True,
        batch_size=4,
        loss=LossConfig(self_distillation=1.0),
        data=DataConfig(height=384, width=1280, split="eigen_full_left",
                        no_crop=True),
        optim=OptimConfig(learning_rate=2e-5, num_epochs=10, milestones=(5,)),
        models_to_load=("encoder", "depth"),
    )
    return cfg.replace(**overrides) if overrides else cfg


STAGE_PRESETS = {
    "stage1": stage1_config,
    "hr_finetune": hr_finetune_config,
    "self_distillation": self_distillation_config,
}
