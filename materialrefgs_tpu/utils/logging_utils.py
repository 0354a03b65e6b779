"""Observability: TensorBoard scalars/images, psnr.json history, timers
(reference train_refnerf.py prepare_output_and_logger:1644, training_report:
1676, save_psnr:1759, utils/system_utils.py Timing)."""
from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager


class TrainLogger:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            self.tb = None
        # Continue an existing history on resume (reference save_psnr
        # re-reads psnr.json, train_refnerf.py:1759-1770) — a restarted run
        # must not erase the pre-resume curve (round-4 weak #6: flagship
        # evidence started at the resume point).
        self.psnr_history: list[dict] = []
        p = os.path.join(log_dir, "psnr.json")
        if os.path.exists(p):
            try:
                old = json.load(open(p))
                if isinstance(old, list):
                    self.psnr_history = old
            except (OSError, ValueError):
                pass

    def scalars(self, iteration: int, metrics: dict, prefix: str = "train"):
        if self.tb is None:
            return
        for k, v in metrics.items():
            try:
                self.tb.add_scalar(f"{prefix}/{k}", float(v), iteration)
            except (TypeError, ValueError):
                pass

    def image(self, iteration: int, name: str, img):
        if self.tb is None:
            return
        import numpy as np

        arr = np.clip(np.asarray(img), 0, 1)
        self.tb.add_image(name, arr.transpose(2, 0, 1), iteration)

    def test_psnr(self, iteration: int, psnr: float):
        """psnr.json history (train_refnerf.py:1759-1770)."""
        self.psnr_history.append({"iteration": iteration, "psnr": psnr})
        with open(os.path.join(self.log_dir, "psnr.json"), "w") as f:
            json.dump(self.psnr_history, f)
        if self.tb is not None:
            self.tb.add_scalar("test/psnr", psnr, iteration)


@contextmanager
def timing(name: str, sync_fn=None, quiet: bool = False):
    """utils/system_utils.py Timing equivalent (block_until_ready as sync)."""
    t0 = time.perf_counter()
    yield
    if sync_fn is not None:
        sync_fn()
    if not quiet:
        print(f"[timing] {name}: {(time.perf_counter() - t0) * 1000:.2f} ms")


@contextmanager
def jax_profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (TPU equivalent of CUDA events/nsys)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
