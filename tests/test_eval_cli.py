"""Eval CLI smoke test: train a few steps then run the full evaluation
(PSNR/SSIM/NLL/AUSE + figures + PLY) on the held-out views."""
import json
import os

import pytest

from tests.datagen import make_blender_dataset

from cfnerf_tpu.cli.eval import evaluate
from cfnerf_tpu.train.loop import train
from cfnerf_tpu.utils.config import parse_args


def _args(datadir, basedir, extra=()):
    return parse_args(
        [
            "--expname", "e", "--dataname", "tiny", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "blender",
            "--N_rand", "32", "--N_samples", "16", "--K_samples", "4",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "32",
            "--type_flows", "triangular", "--use_viewdirs", "--white_bkgd",
            "--no_ndc", "--testskip", "1",
            "--n_iters", "6", "--i_print", "5", "--i_weights", "5",
            "--i_img", "0", "--chunk", "64", *extra,
        ]
    )


@pytest.mark.slow
def test_eval_cli(tmp_path):
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8, n_val=2)
    basedir = str(tmp_path / "logs")
    args = _args(datadir, basedir, extra=["--is_train"])
    train(args)

    args_eval = _args(datadir, basedir)
    summary = evaluate(args_eval)
    assert summary["step"] == 5
    assert len(summary["views"]) == 2
    for key in ("psnr", "ssim", "nll", "ause"):
        assert key in summary

    outdir = os.path.join(basedir, "tiny", "triangular", "e", "eval_000005")
    files = os.listdir(outdir)
    assert "metrics.json" in files
    assert any(f.endswith("_panel.png") for f in files)
    assert any(f.endswith("_uncertainty.ply") for f in files)
    assert any(f.endswith("_ause.png") for f in files)
    loaded = json.load(open(os.path.join(outdir, "metrics.json")))
    assert loaded["views"][0]["view"] == summary["views"][0]["view"]

    # occupancy-grid accelerated eval on the same checkpoint: bakes the
    # density grid, renders at a smaller grid-placed N, full metrics out
    args_occ = _args(datadir, basedir, extra=[
        "--occ_eval", "8", "--occ_res", "16", "--occ_eval_candidates", "32",
    ])
    summary_occ = evaluate(args_occ)
    assert len(summary_occ["views"]) == 2
    import numpy as np
    for key in ("psnr", "ssim", "nll", "ause"):
        assert np.isfinite(summary_occ[key])


def test_no_batching_precrop_train(tmp_path):
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = _args(datadir, basedir, extra=[
        "--is_train", "--no_batching", "--precrop_iters", "3",
        "--precrop_frac", "0.5",
    ])
    train(args)
    mfile = os.path.join(basedir, "tiny", "summaries", "e", "metrics.jsonl")
    assert os.path.exists(mfile)
