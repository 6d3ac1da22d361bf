"""Training orchestration (reference trainer.py:45-913 ``Trainer``).

Host-side epoch loop around the jitted train/eval steps: data loading with
the deterministic host-sharded sampler, device placement, throughput/TB
logging, per-epoch checkpoints (last + best-abs_rel), partial weight
restore for the 3-stage recipe, and the frozen self-distillation teacher.

The device-side work (flip_right doubling, forward, warping, losses, Adam)
lives entirely inside ``train_step`` (train/step.py) — one compiled program
per step, no per-batch Python in the hot loop beyond the data pipeline.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from planedepth_tpu.config import TrainConfig
from planedepth_tpu.data.kitti import DATASETS, readlines, split_path
from planedepth_tpu.data.loader import BatchLoader, EpochSampler
from planedepth_tpu.parallel.mesh import (
    jit_eval_step,
    jit_train_step,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
from planedepth_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from planedepth_tpu.train.step import (
    ModelBundle,
    make_eval_step,
    make_train_step,
)
from planedepth_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_submodules,
    save_checkpoint,
)
from planedepth_tpu.utils.logging import Logger, ThroughputMeter


class Trainer:
    def __init__(self, cfg: TrainConfig, datasets=None):
        self.cfg = cfg
        self.log_path = os.path.join(cfg.log_dir, cfg.model_name)
        if cfg.mesh_shape:
            n = int(np.prod(cfg.mesh_shape))
            spatial = cfg.mesh_shape[1] if len(cfg.mesh_shape) > 1 else 1
            self.mesh = make_mesh(jax.devices()[:n], spatial=spatial)
        else:
            self.mesh = make_mesh()
        self.n_devices = len(self.mesh.devices.ravel())
        data_dim = self.mesh.shape[  # batch axis extent of the mesh
            self.mesh.axis_names[0]
        ]
        assert cfg.per_step_batch % (data_dim * jax.process_count()) == 0, (
            f"per_step_batch {cfg.per_step_batch} must be divisible by the "
            f"mesh data axis ({data_dim}) x hosts ({jax.process_count()}); "
            f"set --batch_size or mesh_shape accordingly"
        )

        # data ---------------------------------------------------------------
        if datasets is not None:
            self.train_dataset, self.val_dataset = datasets
        else:
            ds_cls = DATASETS[cfg.data.dataset]
            img_ext = ".png" if cfg.data.png else ".jpg"
            train_files = readlines(split_path(cfg.data.split, "train"))
            val_files = readlines(split_path(cfg.data.split, "val"))
            self.train_dataset = ds_cls(
                cfg.data.data_path, train_files, cfg.data.height,
                cfg.data.width, cfg.novel_frame_ids, is_train=True,
                use_crop=not cfg.data.no_crop,
                use_colmap=cfg.data.use_colmap,
                colmap_path=cfg.data.colmap_path, img_ext=img_ext,
                seed=cfg.seed, crop_factor=cfg.data.crop_factor,
            )
            self.val_dataset = ds_cls(
                cfg.data.data_path, val_files, cfg.data.height,
                cfg.data.width, cfg.novel_frame_ids, is_train=False,
                use_crop=False, use_colmap=False, img_ext=img_ext,
                seed=cfg.seed,
            )

        n_hosts = jax.process_count()
        host = jax.process_index()
        per_host_batch = cfg.per_step_batch // n_hosts
        self.train_sampler = EpochSampler(
            len(self.train_dataset), per_host_batch, n_hosts, host,
            shuffle=True, seed=cfg.seed, drop_last=True,
        )
        self.val_sampler = EpochSampler(
            len(self.val_dataset), per_host_batch, n_hosts, host,
            shuffle=False, seed=cfg.seed, drop_last=False,
        )
        self.train_loader = BatchLoader(
            self.train_dataset, self.train_sampler,
            num_workers=cfg.data.num_workers,
        )
        self.val_loader = BatchLoader(
            self.val_dataset, self.val_sampler,
            num_workers=cfg.data.num_workers,
        )
        self.steps_per_epoch = self.train_sampler.steps_per_epoch()

        # models / optimizer -------------------------------------------------
        from planedepth_tpu.train.mono import fused_warp2d_ok
        from planedepth_tpu.train.step import fused_mixed_ok, fused_sweep_ok

        if (
            jax.default_backend() == "tpu"
            and not fused_sweep_ok(cfg)
            and not fused_warp2d_ok(cfg)
            and not fused_mixed_ok(cfg)
        ):
            import warnings

            warnings.warn(
                "This training mode is NOT covered by the fused Pallas "
                "kernels (see train/step.py:fused_sweep_ok and "
                "train/mono.py:fused_warp2d_ok) and will take the "
                "XLA-gather fallback, measured ~170x slower on TPU "
                "(0.072 vs ~12 imgs/s/chip at HR, PERF_NOTES.md) — "
                "lane-dimension gathers lower to near-scalar TPU code. "
                "Covered: stereo disp_warp (fused sweep, incl. use_mom "
                "and alpha_self), stereo+temporal disp_warp (mixed), "
                "homography_warp/depth_warp incl. render_probability and "
                "yz planes (warp2d kernel), and disp_warp with "
                "render_probability/yz (warp2d rescue) — all with "
                "fused_sweep=True.  Remaining fallback-only flag: "
                "use_mom under homography_warp/depth_warp.",
                stacklevel=2,
            )
        self.bundle = ModelBundle(cfg)
        params, batch_stats, pc_params = self.bundle.init(
            jax.random.PRNGKey(cfg.seed), cfg.data.height, cfg.data.width
        )
        # ImageNet-pretrained encoder / frozen perceptual weights
        # (reference resnet_encoder.py:35, layers.py:381): converted npz
        # trees merged into the fresh init
        from planedepth_tpu.utils.pretrained import (
            apply_pretrained, check_perceptual_weights,
        )

        params, batch_stats, pc_params, loaded = apply_pretrained(
            cfg, params, batch_stats, pc_params
        )
        check_perceptual_weights(cfg, loaded)
        if loaded:
            print(f"[pretrained] loaded: {', '.join(loaded)}")

        self.tx = make_optimizer(cfg, self.steps_per_epoch)
        self.state = create_train_state(
            params, batch_stats, self.tx, pc_params=pc_params
        )

        if cfg.load_weights_folder is not None:
            payload = load_checkpoint(cfg.load_weights_folder)
            self.state = restore_submodules(
                self.state, payload, cfg.models_to_load,
                restore_optimizer=cfg.restore_optimizer,
            )

        if cfg.loss.self_distillation > 0:
            # frozen teacher = deep copy of the (possibly just-restored)
            # student (reference trainer.py:109-112)
            teacher = {
                "params": jax.tree_util.tree_map(
                    lambda x: np.array(x), self.state.params
                ),
                "batch_stats": jax.tree_util.tree_map(
                    lambda x: np.array(x), self.state.batch_stats
                ),
            }
            self.state = self.state.replace(teacher=teacher)

        self.state = replicate_state(self.state, self.mesh)
        self.train_step = jit_train_step(
            make_train_step(self.bundle, self.tx), self.mesh
        )
        self.eval_step = jit_eval_step(
            make_eval_step(self.bundle), self.mesh
        )

        def viz_step(state, batch):
            """Rare forward pass producing TB image panels
            (reference trainer.py:831-856 ``log_img``)."""
            outputs, _ = self.bundle.depth_forward(
                state.params, state.batch_stats, batch["color_aug_l"],
                batch["grid"], train=False,
            )
            from planedepth_tpu.train.view_synthesis import pred_novel_images

            color_name = "color_aug" if cfg.loss.match_aug else "color"
            rec = pred_novel_images(
                outputs, batch[f"{color_name}_l"],
                tuple(s for s in cfg.target_sides if s == "r"),
                {"r": batch["Rt_r"]}, batch["K"], batch["inv_K"],
                warp_type=cfg.warp_type,
                use_mixture_loss=cfg.model.use_mixture_loss,
                render_probability=cfg.model.render_probability,
            )
            out = {"disp": outputs["disp"]}
            if ("rgb_rec", "r") in rec:
                out["rgb_rec_r"] = rec[("rgb_rec", "r")]
            return out

        self.viz_step = jit_eval_step(viz_step, self.mesh)

        # logging ------------------------------------------------------------
        self.is_chief = host == 0
        self.logger = Logger(self.log_path, enabled=self.is_chief)
        if self.is_chief:
            self.logger.save_config(cfg.to_json())
            self._save_provenance()
        self.best_absrel = 10.0
        self._val_panel_step = 0
        # resume fast-forward (reference trainer.py:242-244 replays the LR
        # scheduler): advance both TrainState.step and the optax schedule
        # count (the latter is what the LR decay actually reads — a fresh
        # Adam would otherwise restart at the base LR)
        self.step_count = cfg.optim.start_epoch * self.steps_per_epoch
        if self.step_count:
            from planedepth_tpu.train.state import fast_forward_schedule

            self.state = self.state.replace(
                step=jnp.asarray(self.step_count, jnp.int32),
                opt_state=fast_forward_schedule(
                    self.state.opt_state, self.step_count
                ),
            )
        self.meter = ThroughputMeter(
            self.steps_per_epoch * cfg.optim.num_epochs, cfg.per_step_batch
        )
        self.rng = jax.device_put(
            jax.random.PRNGKey(cfg.seed), replicated(self.mesh)
        )

    # --- loops --------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        for epoch in range(cfg.optim.start_epoch, cfg.optim.num_epochs):
            self.run_epoch(epoch)
            if self.is_chief:
                self.save("last_models")

    def _device_prefetch(self, epoch: int):
        """Double-buffered device placement: the next batch's H2D transfer
        overlaps the current step's compute (device_put is async)."""
        it = self.train_loader.epoch(epoch)
        prev_host = None
        prev_dev = None
        for batch in it:
            dev = shard_batch(batch, self.mesh)
            if prev_dev is not None:
                yield prev_host, prev_dev
            prev_host, prev_dev = batch, dev
        if prev_dev is not None:
            yield prev_host, prev_dev

    def run_epoch(self, epoch: int):
        cfg = self.cfg
        for batch_idx, (batch, device_batch) in enumerate(
            self._device_prefetch(epoch)
        ):
            t0 = time.time()
            self.state, metrics = self.train_step(
                self.state, device_batch, self.rng
            )
            early = batch_idx % 100 == 0 and self.step_count < cfg.log_frequency
            late = self.step_count % cfg.log_frequency == 0
            if early or late:
                loss = float(metrics["loss/total_loss"])
                dur = time.time() - t0
                if self.is_chief:
                    line = self.meter.log_line(
                        epoch, batch_idx, self.step_count, dur, loss
                    )
                    print(line)
                    self.logger.text(line)
                    self.logger.scalars(
                        "train",
                        {k: float(v) for k, v in metrics.items()},
                        self.step_count,
                    )
            # train-mode image panels every log_img_frequency steps
            # (reference trainer.py:316-320); always on the epoch's first
            # batch so short runs still produce panels
            if (
                batch_idx == 0
                or self.step_count % cfg.log_img_frequency == 0
            ) and self.is_chief:
                self.log_images("train", batch)
            self.step_count += 1
        self.val(epoch)

    def val(self, epoch: int) -> Dict[str, float]:
        """Validation loop (reference trainer.py:468-521).

        Cross-host aggregation: under multi-process, ``shard_batch``
        assembles each step's GLOBAL batch from the per-host slices and the
        jitted ``eval_step`` reduces over it, so every process sees
        identical global metrics per step (the reference's explicit
        ``dist.all_reduce``, trainer.py:504-508).  The host-side weighted
        accumulation below then yields the same global mean on every host
        (weights are uniformly scaled by process_count).
        """
        total: Dict[str, float] = {}
        n = 0
        for batch_idx, batch in enumerate(self.val_loader.epoch(0)):
            if "depth_gt_l" not in batch:
                continue
            device_batch = shard_batch(batch, self.mesh)
            metrics = self.eval_step(self.state, device_batch)
            # val image panels every log_img_frequency batches
            # (reference trainer.py:499-500).  Panels use their own
            # monotonic step so they never collide with train scalar steps
            # across epochs (the "val" writer is separate from "train").
            if batch_idx % self.cfg.log_img_frequency == 0 and self.is_chief:
                self.log_images("val", batch, step=self._val_panel_step)
                self._val_panel_step += 1
            b = batch["color_l"].shape[0]
            n += b
            for k, v in metrics.items():
                total[k] = total.get(k, 0.0) + float(v) * b
        if n == 0:
            return {}
        metrics = {k: v / n for k, v in total.items()}
        if metrics.get("de/abs_rel", 10.0) < self.best_absrel:
            self.best_absrel = metrics["de/abs_rel"]
            if self.is_chief:
                self.save("best_models")
        if self.is_chief:
            self.logger.scalars("val", metrics, self.step_count)
            self.logger.metric_row(metrics)
        return metrics

    def log_images(self, mode: str, batch: Dict[str, np.ndarray],
                   step: Optional[int] = None):
        """TB image panels: inputs, reconstruction, normalized disparity
        (reference trainer.py:831-856)."""
        from planedepth_tpu.utils.logging import normalize_image

        device_batch = shard_batch(batch, self.mesh)
        viz = jax.device_get(self.viz_step(self.state, device_batch))
        images = {}
        for j in range(min(4, batch["color_l"].shape[0])):
            images[f"color_l/{j}"] = np.asarray(batch["color_l"][j])
            images[f"color_r/{j}"] = np.asarray(batch["color_r"][j])
            if "rgb_rec_r" in viz:
                images[f"color_pred_r/{j}"] = np.clip(
                    np.asarray(viz["rgb_rec_r"][j]), 0, 1
                )
            disp = normalize_image(np.asarray(viz["disp"][j]))
            images[f"disp/{j}"] = np.repeat(disp, 3, axis=-1)
        self.logger.images(
            mode, images, self.step_count if step is None else step
        )

    def _save_provenance(self):
        """Run provenance: git commit + package version (replaces the
        reference's source-file snapshots, trainer.py:57-67)."""
        import subprocess

        import planedepth_tpu

        info = {"version": planedepth_tpu.__version__}
        try:
            info["git"] = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
            ).stdout.strip()
        except Exception:
            pass
        with open(os.path.join(self.log_path, "provenance.json"), "w") as f:
            json.dump(info, f, indent=2)

    def save(self, tag: str):
        save_checkpoint(
            self.log_path, tag, jax.device_get(self.state),
            config_json=self.cfg.to_json(),
            height=self.cfg.data.height, width=self.cfg.data.width,
        )
