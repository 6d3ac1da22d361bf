"""End-to-end Trainer drive: epoch loop, validation, checkpointing, logging
(reference trainer.py:239-323 ``train``/``run_epoch``/``val``) — the
orchestration layer above the jitted step, exercised on a synthetic dataset
injected via ``Trainer(cfg, datasets=...)``.
"""
import json
import os

import numpy as np
import pytest

from planedepth_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    PlaneConfig,
    TrainConfig,
)
from planedepth_tpu.data.synthetic import make_stereo_batch

pytestmark = pytest.mark.heavy

H, W = 64, 96


class SyntheticDataset:
    """Unbatched synthetic stereo samples in the dataset protocol
    (``__len__`` + ``getitem(index, epoch)``)."""

    def __init__(self, n=8):
        self.n = n

    def __len__(self):
        return self.n

    def getitem(self, index, epoch=0):
        batch = make_stereo_batch(1, H, W, seed=index)
        return {k: v[0] for k, v in batch.items()}


def e2e_config(tmp_path, **kw):
    base = dict(
        model_name="e2e",
        log_dir=str(tmp_path),
        batch_size=2,
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=False,
            plane_residual=False, num_ep=0,
            planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                               xz_levels=0, yz_levels=0),
        ),
        loss=LossConfig(alpha_pc=0.0, alpha_smooth=0.01),
        data=DataConfig(height=H, width=W, num_workers=2),
        optim=OptimConfig(learning_rate=1e-4, num_epochs=1, milestones=()),
        bf16=False,
        log_frequency=2,
        log_img_frequency=2,
        mesh_shape=(2,),        # batch 2 over 2 of the 8 virtual devices
    )
    base.update(kw)
    return TrainConfig(**base)


def test_trainer_full_loop_with_checkpoints(tmp_path):
    from planedepth_tpu.train.trainer import Trainer

    cfg = e2e_config(tmp_path)
    trainer = Trainer(
        cfg, datasets=(SyntheticDataset(8), SyntheticDataset(4))
    )
    assert trainer.steps_per_epoch == 4
    trainer.train()

    run_dir = os.path.join(str(tmp_path), "e2e")
    # checkpoints: last after the epoch, best from val (abs_rel < init 10.0)
    assert os.path.isdir(os.path.join(run_dir, "last_models"))
    assert os.path.isdir(os.path.join(run_dir, "best_models"))
    # provenance + config dump (reference opt.json, trainer.py:858-867)
    assert os.path.exists(os.path.join(run_dir, "provenance.json"))
    with open(os.path.join(run_dir, "opt.json")) as f:
        opt = json.load(f)
    assert opt["batch_size"] == 2
    # checkpoint meta embeds resolution + config
    with open(os.path.join(run_dir, "last_models.meta.json")) as f:
        meta = json.load(f)
    assert (meta["height"], meta["width"]) == (H, W)
    assert meta["config"]["model"]["num_layers"] == 18
    # TB event files + text log were written
    assert os.path.exists(os.path.join(run_dir, "logs.log"))
    sub = [d for d in os.listdir(run_dir) if d in ("train", "val")]
    assert set(sub) == {"train", "val"}
    assert trainer.step_count == 4
    assert trainer.best_absrel < 10.0


def test_trainer_resume_from_checkpoint(tmp_path):
    """Crash-resume: a second Trainer constructed with
    load_weights_folder + start_epoch picks up params AND Adam state."""
    import jax

    from planedepth_tpu.train.trainer import Trainer

    cfg = e2e_config(tmp_path, optim=OptimConfig(
        learning_rate=1e-4, num_epochs=1, milestones=(),
    ))
    t1 = Trainer(cfg, datasets=(SyntheticDataset(8), SyntheticDataset(4)))
    t1.train()
    ckpt = os.path.join(str(tmp_path), "e2e", "last_models")

    cfg2 = e2e_config(
        tmp_path, model_name="e2e_resumed",
        load_weights_folder=ckpt,
        optim=OptimConfig(learning_rate=1e-4, num_epochs=2, milestones=(),
                          start_epoch=1),
    )
    t2 = Trainer(cfg2, datasets=(SyntheticDataset(8), SyntheticDataset(4)))
    # params restored bit-equal
    p1 = jax.device_get(t1.state.params)
    p2 = jax.device_get(t2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p1, p2,
    )
    # Adam moments restored (non-zero after training)
    flat = jax.tree_util.tree_leaves(jax.device_get(t2.state.opt_state))
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat)
    # step fast-forward for the LR schedule
    assert t2.step_count == t2.steps_per_epoch
    t2.train()
    assert t2.step_count == 2 * t2.steps_per_epoch


def test_trainer_production_stack_e2e(tmp_path):
    """Full Trainer loop on the PRODUCTION configuration: fused Pallas
    sweep (interpret) with the in-kernel disparity head, s2d decoder tail
    + packed PE, mixture loss + plane residuals + DenseASPP, sharded over
    2 devices — train epoch, val metrics, checkpoints."""
    from planedepth_tpu.train.trainer import Trainer

    cfg = e2e_config(
        tmp_path, model_name="e2e_prod",
        model=ModelConfig(
            net_type="ResNet", num_layers=18, use_denseaspp=True,
            use_mixture_loss=True, plane_residual=True, num_ep=8,
            planes=PlaneConfig(disp_levels=9, disp_min=2, disp_max=40,
                               xz_levels=4, yz_levels=0),
            fused_head="interpret", s2d_tail="on",
        ),
        flip_right=True,
        batch_size=4,           # flip_right halves to per-step 2
        fused_sweep=True,
    )
    trainer = Trainer(cfg, datasets=(SyntheticDataset(8), SyntheticDataset(2)))
    trainer.train()
    run_dir = os.path.join(str(tmp_path), "e2e_prod")
    assert os.path.isdir(os.path.join(run_dir, "last_models"))
    assert trainer.best_absrel < 10.0
