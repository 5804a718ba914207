"""--k_schedule: piecewise-constant Monte-Carlo sample-count curriculum.

K is not a parameter axis — the same params/opt_state flow through every
stage — so the schedule must train end-to-end across stage boundaries and
leave checkpoints/eval identical in structure to a fixed-K run.
"""
import glob
import os

import numpy as np
import pytest

from tests.datagen import make_blender_dataset

from cfnerf_tpu.train.loop import k_for_step, parse_k_schedule, train
from cfnerf_tpu.utils.config import parse_args


def test_parse_k_schedule():
    stages = parse_k_schedule("8:0,16:2000,32:5000")
    assert stages == [(0, 8), (2000, 16), (5000, 32)]
    assert k_for_step(stages, 0) == 8
    assert k_for_step(stages, 1999) == 8
    assert k_for_step(stages, 2000) == 16
    assert k_for_step(stages, 99999) == 32
    # unsorted input sorts by step
    assert parse_k_schedule("32:5000,8:0") == [(0, 8), (5000, 32)]


def test_parse_k_schedule_rejects_bad_specs():
    with pytest.raises(ValueError):
        parse_k_schedule("8:100,16:2000")  # no stage at step 0
    with pytest.raises(ValueError):
        parse_k_schedule("abc")
    with pytest.raises(ValueError):
        parse_k_schedule("0:0")  # non-positive K
    with pytest.raises(ValueError):
        # K=1 silently NaNs the KDE loss (std over one sample, ddof=1,
        # times n/(n-1) = 1/0) — must be rejected at parse time
        parse_k_schedule("1:0,8:1000")
    with pytest.raises(ValueError, match="duplicate start_step"):
        parse_k_schedule("8:0,16:0")  # typo'd duplicate start step


@pytest.mark.slow
@pytest.mark.parametrize("n_inner", ["1", "4"])
def test_train_with_k_schedule(tmp_path, n_inner):
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = parse_args(
        [
            "--expname", "t", "--dataname", "tiny", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "blender",
            "--N_rand", "32", "--N_samples", "16", "--K_samples", "4",
            "--k_schedule", "2:0,4:8",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "32",
            "--type_flows", "triangular", "--beta1", "0.01",
            "--use_viewdirs", "--white_bkgd", "--no_ndc",
            "--n_iters", "16", "--i_print", "4", "--i_weights", "16",
            "--i_img", "0", "--chunk", "64", "--n_inner", n_inner,
            "--is_train",
        ]
    )
    train(args)  # crosses the K=2 -> K=4 boundary at step 8

    import json

    mfile = os.path.join(basedir, "tiny", "summaries", "t", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    losses = [r["train/loss"] for r in recs if "train/loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    # a checkpoint from the full-K stage exists and is loadable by the
    # fixed-K eval model (same param pytree)
    rundir = os.path.join(basedir, "tiny", "triangular", "t")
    assert glob.glob(os.path.join(rundir, "0000*"))
