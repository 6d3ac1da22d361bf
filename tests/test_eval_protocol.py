"""Eigen evaluation protocol tests with synthetic ground truth."""
import numpy as np

from planedepth_tpu.eval.metrics import (
    batch_post_process_disparity,
    compute_errors,
    evaluate_disparities,
)

RNG = np.random.default_rng(3)


def test_compute_errors_perfect():
    gt = RNG.uniform(1, 70, (1000,))
    m = compute_errors(gt, gt.copy())
    assert m[0] == 0.0 and m[4] == 1.0


def test_post_process_is_mean():
    l = RNG.uniform(1, 10, (2, 4, 6))
    r = RNG.uniform(1, 10, (2, 4, 6))
    np.testing.assert_allclose(
        batch_post_process_disparity(l, r), 0.5 * (l + r)
    )


def test_evaluate_disparities_stereo_exact():
    """Disparities that encode the GT depth exactly (after the x5.4 stereo
    scale) must score ~0 abs_rel under the full protocol."""
    num, h, w = 4, 96, 320
    gt_h, gt_w = 192, 640
    pred_disps = []
    gt_depths = []
    for i in range(num):
        depth = RNG.uniform(5.0, 60.0, (gt_h, gt_w)).astype(np.float64)
        # low-frequency depth so the cv2 resize between prediction and GT
        # resolution doesn't create self-inflicted error
        depth = np.full((gt_h, gt_w), 10.0 + i * 5.0)
        gt_depths.append(depth)
        model_depth = depth / 5.4
        disp_full = 0.1 * 0.58 * w / model_depth
        pred = disp_full[::2, ::2].astype(np.float32)
        pred_disps.append(pred)
    metrics = evaluate_disparities(
        np.stack(pred_disps), gt_depths, pred_width=w,
        eval_split="eigen_raw", stereo=True,
    )
    assert metrics["abs_rel"] < 1e-3, metrics
    assert metrics["a1"] == 1.0


def test_evaluate_disparities_mono_median_scaling():
    """Mono protocol: a global scale error is removed by median scaling."""
    num, h, w = 2, 96, 320
    gt_h, gt_w = 192, 640
    pred_disps, gt_depths = [], []
    for i in range(num):
        depth = np.full((gt_h, gt_w), 20.0)
        gt_depths.append(depth)
        model_depth = depth * 0.123   # arbitrary wrong scale
        disp_full = 0.1 * 0.58 * w / model_depth
        pred_disps.append(disp_full[::2, ::2].astype(np.float32))
    metrics = evaluate_disparities(
        np.stack(pred_disps), gt_depths, pred_width=w,
        eval_split="eigen_raw", stereo=False,
    )
    assert metrics["abs_rel"] < 1e-3, metrics
    assert abs(metrics["ratio_med"] - 1 / 0.123) / (1 / 0.123) < 1e-3


def test_external_disp_remap_and_benchmark_png_export(tmp_path):
    """The reference CLI's external-disparity evaluation path
    (evaluate_depth_HR.py:174-210): load disps from .npy, remap
    eigen->benchmark ids, save, and export 16-bit benchmark PNGs."""
    import os

    import numpy as np
    from PIL import Image

    from planedepth_tpu.config import DataConfig, TrainConfig
    from planedepth_tpu.eval.evaluator import evaluate

    rng = np.random.default_rng(0)
    disps = rng.uniform(0.01, 0.3, (4, 12, 40)).astype(np.float32)
    ext = tmp_path / "disps.npy"
    np.save(ext, disps)

    splits = tmp_path / "splits"
    (splits / "benchmark").mkdir(parents=True)
    remap = np.array([2, 0], np.int64)
    np.save(splits / "benchmark" / "eigen_to_benchmark_ids.npy", remap)

    out = tmp_path / "preds"
    cfg = TrainConfig(data=DataConfig(height=32, width=64))
    res = evaluate(
        cfg, params=None, batch_stats=None, eval_split="benchmark",
        ext_disp_to_eval=str(ext), eval_eigen_to_benchmark=True,
        save_pred_disps=str(out), splits_dir=str(splits),
    )
    assert res == {}
    saved = np.load(str(out) + ".npy")
    np.testing.assert_array_equal(saved, disps[remap])
    # PNGs land in the save dir; 16-bit depth = clip(5.4/disp)*256
    png_dir = str(out)
    files = [f for f in sorted(os.listdir(png_dir)) if f.endswith(".png")]
    assert len(files) == 2
    img = np.asarray(Image.open(os.path.join(png_dir, files[0])))
    assert img.dtype == np.uint16 and img.shape == (352, 1216)
    assert img.max() > 0
