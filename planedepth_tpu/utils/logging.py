"""Observability: TensorBoard writers, console throughput/ETA, logs.log.

Counterpart of the reference's logging stack (trainer.py:174-184,812-867):
tensorboardX scalar + image panels, the ``examples/s`` console line with ETA,
the ``logs.log`` text file, and the ``opt.json`` config dump.  Additionally
exposes :func:`profile_step` hooking ``jax.profiler`` traces — the TPU
upgrade over the reference's wall-clock-only instrumentation (SURVEY.md §5).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def sec_to_hm_str(t: float) -> str:
    """10239 -> '02h50m39s' (reference utils.py:45-62)."""
    t = int(t)
    s = t % 60
    m = (t // 60) % 60
    h = t // 3600
    return f"{h:02d}h{m:02d}m{s:02d}s"


def normalize_image(x: np.ndarray) -> np.ndarray:
    """Rescale to [0, 1] for TB panels (reference utils.py:36-42)."""
    ma, mi = float(np.max(x)), float(np.min(x))
    return (x - mi) / (ma - mi + 1e-5)


class Logger:
    """TB + text + console logging for one run."""

    def __init__(self, log_path: str, enabled: bool = True):
        self.log_path = log_path
        self.enabled = enabled
        self.writers = {}
        self.log_file = None
        if enabled:
            os.makedirs(log_path, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter

                for mode in ("train", "val"):
                    self.writers[mode] = SummaryWriter(
                        os.path.join(log_path, mode)
                    )
            except Exception:
                self.writers = {}
            self.log_file = open(os.path.join(log_path, "logs.log"), "a")

    def scalars(self, mode: str, values: Dict[str, float], step: int):
        if not self.enabled:
            return
        w = self.writers.get(mode)
        if w is not None:
            for k, v in values.items():
                w.add_scalar(k, float(v), step)

    def images(self, mode: str, images: Dict[str, np.ndarray], step: int):
        """images: name -> (H, W, C) float in [0, 1]."""
        if not self.enabled:
            return
        w = self.writers.get(mode)
        if w is not None:
            for k, v in images.items():
                w.add_image(k, np.moveaxis(v, -1, 0), step)

    def text(self, line: str):
        if self.log_file is not None:
            print(line, file=self.log_file, flush=True)

    def metric_row(self, metrics: Dict[str, float]):
        """LaTeX-ready 7-metric row (reference trainer.py:516-517)."""
        names = ["de/abs_rel", "de/sq_rel", "de/rms", "de/log_rms",
                 "da/a1", "da/a2", "da/a3"]
        header = "\n  " + ("{:>8} | " * 7).format(
            "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"
        )
        row = ("&{: 8.4f}  " * 7).format(
            *[float(metrics[n]) for n in names]
        ) + "\\\\"
        print(header)
        print(row)
        self.text(header)
        self.text(row)

    def save_config(self, config_json: str):
        if self.enabled:
            with open(os.path.join(self.log_path, "opt.json"), "w") as f:
                f.write(config_json)

    def close(self):
        for w in self.writers.values():
            w.close()
        if self.log_file is not None:
            self.log_file.close()


class ThroughputMeter:
    """examples/s + ETA console logging (reference trainer.py:812-822)."""

    def __init__(self, total_steps: int, batch_size: int):
        self.total_steps = total_steps
        self.batch_size = batch_size
        self.start = time.time()

    def log_line(self, epoch: int, batch_idx: int, step: int,
                 duration: float, loss: float) -> str:
        sps = self.batch_size / max(duration, 1e-9)
        elapsed = time.time() - self.start
        left = (
            (self.total_steps / max(step, 1) - 1.0) * elapsed
            if step > 0 else 0
        )
        return (
            f"epoch {epoch:>3} | batch {batch_idx:>6} | "
            f"examples/s: {sps:5.1f} | loss: {loss:.5f} | "
            f"time elapsed: {sec_to_hm_str(elapsed)} | "
            f"time left: {sec_to_hm_str(left)}"
        )


def profile_step(log_dir: str, fn, *args, **kwargs):
    """Run ``fn`` under a jax profiler trace (TPU-native tracing upgrade)."""
    import jax

    with jax.profiler.trace(os.path.join(log_dir, "profile")):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out
