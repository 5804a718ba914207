"""Observability: TensorBoard scalars + image panels, console lines, JSONL.

Parity target: the reference's SummaryWriter usage
(/root/reference/run_nerf_uncertainty_NF.py:929,1055-1062,1082,1112-1196):
  * writer at basedir/dataname/summaries/expname;
  * scalars train/{loss,loss_nll,loss_entropy,logprob,mse,pnsr,depth_loss}
    and iter_time (the 'pnsr' typo is preserved as an alias so existing
    reference dashboards keep working; a correctly-spelled 'psnr' is also
    emitted);
  * per-i_img image panels for one train and one val view: gt, mean
    prediction, MAGMA disparity, JET MSE heatmap, JET per-pixel-std
    (uncertainty) heatmap with the n/(n-1) correction (:1129-1131).

A JSONL metrics stream is always written (TB optional) so headless runs
stay observable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

from cfnerf_tpu.ops.metrics import std_over_k, to8b


def _colormap(img01: np.ndarray, cmap: str) -> np.ndarray:
    """(H, W) or (H, W, 1|3) in [0,1] -> (3, H, W) uint8 heatmap."""
    import cv2

    cm = {"jet": cv2.COLORMAP_JET, "magma": cv2.COLORMAP_MAGMA}[cmap]
    if img01.ndim == 3 and img01.shape[-1] == 3:
        src = to8b(img01)
    else:
        src = to8b(img01.reshape(img01.shape[0], img01.shape[1], -1)[..., 0])[..., None]
        src = np.repeat(src, 3, -1)
    heat = cv2.applyColorMap(src[..., 0] if src.shape[-1] == 1 else src, cm)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    return heat.transpose(2, 0, 1)


class MetricsLogger:
    def __init__(self, basedir: str, dataname: str, expname: str, *, use_tb: bool = True):
        self.summary_dir = os.path.join(basedir, dataname, "summaries", expname)
        os.makedirs(self.summary_dir, exist_ok=True)
        self.writer = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(self.summary_dir)
            except Exception:
                self.writer = None
        self.jsonl = open(os.path.join(self.summary_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()

    def scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "t": time.time() - self._t0}
        for k, v in scalars.items():
            rec[k] = float(v)
            if self.writer is not None:
                self.writer.add_scalar(k, float(v), step)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()

    def image_panel(
        self,
        step: int,
        prefix: str,
        *,
        gt: np.ndarray,          # (H, W, 3)
        rgb_k: np.ndarray,       # (H, W, 3, K)
        disp_k: np.ndarray,      # (H, W, K)
    ) -> None:
        """The reference's five-image panel (:1119-1147)."""
        if self.writer is None:
            return
        rgb_mean = rgb_k.mean(-1)
        disp_mean = disp_k.mean(-1)[..., None]

        mse_map = (rgb_mean - gt) ** 2
        heat_mse = _colormap(mse_map, "jet")

        rgb_std = std_over_k(rgb_k)
        heat_std = _colormap(rgb_std, "jet")

        disp_norm = disp_mean / (np.percentile(disp_mean, 90) + 1e-8)
        heat_disp = _colormap(np.clip(disp_norm, 0, 1), "magma")

        self.writer.add_image(prefix + "rgb_gt", to8b(gt).transpose(2, 0, 1), step)
        self.writer.add_image(prefix + "rgb_pred", to8b(rgb_mean).transpose(2, 0, 1), step)
        self.writer.add_image(prefix + "rgb_disp_pred", heat_disp, step)
        self.writer.add_image(prefix + "heatmap_mse_", heat_mse, step)
        self.writer.add_image(prefix + "heatmap_v", heat_std, step)

    def console(self, step: int, scalars: Dict[str, float], colmap_depth: bool = False) -> None:
        if colmap_depth and "train/depth_loss" in scalars:
            print(
                f"[TRAIN] Iter: {step} Loss: {scalars['train/loss']:.6f} "
                f"entropy: {scalars['train/loss_entropy']:.6f} "
                f"depth: {scalars['train/depth_loss']:.6f} "
                f"nll: {scalars['train/loss_nll']:.6f} PSNR: {scalars['train/psnr']:.4f}"
            )
        else:
            print(
                f"[TRAIN] Iter: {step} Loss: {scalars['train/loss']:.6f} "
                f"nll: {scalars['train/loss_nll']:.6f} PSNR: {scalars['train/psnr']:.4f}"
            )

    def close(self):
        if self.writer is not None:
            self.writer.close()
        self.jsonl.close()
