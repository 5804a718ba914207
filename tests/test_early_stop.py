"""--early_stop_val: the internal-val stream's consumer with teeth
(VERDICT r04 task 5b).  The reference builds the val ray stream and never
consumes it (run_nerf_uncertainty_NF.py:877-885, :954-963); our loop logs
val/psnr+val/nll at i_print cadence and can stop on a stale val/psnr.
"""
import glob
import json
import os

import numpy as np
import pytest

from cfnerf_tpu.train.loop import ValEarlyStop


def test_val_early_stop_counts_stale_evals():
    es = ValEarlyStop(patience=3, min_delta=0.01)
    assert not es.update(20.0)   # first eval sets best
    assert not es.update(20.5)   # improvement resets
    assert not es.update(20.5)   # stale 1 (within min_delta)
    assert not es.update(20.51)  # stale 2 (0.01 is not > min_delta)
    assert es.update(20.4)       # stale 3 -> stop
    assert es.best == 20.5


def test_val_early_stop_reset_on_improvement():
    es = ValEarlyStop(patience=2)
    es.update(10.0)
    assert not es.update(9.0)    # stale 1
    assert not es.update(11.0)   # improvement: counter back to 0
    assert not es.update(10.9)   # stale 1
    assert es.update(10.8)       # stale 2 -> stop


def test_val_early_stop_rejects_bad_patience():
    with pytest.raises(ValueError):
        ValEarlyStop(patience=0)


@pytest.mark.slow
def test_early_stop_halts_training(tmp_path):
    """An impossible min_delta makes every val eval 'stale': with
    patience 2 and i_print 2 the run must stop long before n_iters and
    checkpoint at the stop step (no step-40 checkpoint exists)."""
    from tests.datagen import make_blender_dataset

    from cfnerf_tpu.train.loop import train
    from cfnerf_tpu.utils.config import parse_args

    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = parse_args(
        [
            "--expname", "es", "--dataname", "tiny", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "blender",
            "--N_rand", "32", "--N_samples", "16", "--K_samples", "4",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "32",
            "--type_flows", "triangular",
            "--use_viewdirs", "--white_bkgd", "--no_ndc",
            "--n_iters", "40", "--i_print", "2", "--i_weights", "1000",
            "--i_img", "0", "--chunk", "64", "--is_train",
            "--early_stop_val", "2", "--early_stop_min_delta", "1000.0",
        ]
    )
    train(args)

    rundir = os.path.join(basedir, "tiny", "triangular", "es")
    ckpts = sorted(glob.glob(os.path.join(rundir, "0*_01")))
    assert ckpts, "early stop must checkpoint at the stop step"
    stop_step = int(os.path.basename(ckpts[-1]).split("_")[0])
    # first eval (step 2) sets best; evals at steps 4 and 6 are stale
    assert stop_step <= 10, f"expected an early stop, got step {stop_step}"

    mfile = os.path.join(basedir, "tiny", "summaries", "es", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    assert max(r["step"] for r in recs) <= 10
    assert any("val/nll" in r for r in recs)
    assert all(np.isfinite(r.get("val/nll", 0.0)) for r in recs)
