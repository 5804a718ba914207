"""Ensemble CLI: train two tiny members, aggregate-eval the mixture."""
import json
import os

import pytest

from tests.datagen import make_blender_dataset

from cfnerf_tpu.cli.ensemble import eval_ensemble, train_ensemble
from cfnerf_tpu.utils.config import config_parser


@pytest.mark.slow
def test_ensemble_train_and_eval(tmp_path):
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8, n_val=1)
    basedir = str(tmp_path / "logs")
    parser = config_parser()
    parser.add_argument("--n_members", type=int, default=2)
    args = parser.parse_args(
        [
            "--expname", "ens", "--dataname", "tiny", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "blender",
            "--N_rand", "16", "--N_samples", "8", "--K_samples", "4",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "16",
            "--type_flows", "triangular", "--use_viewdirs", "--white_bkgd",
            "--no_ndc", "--testskip", "1",
            "--n_iters", "4", "--i_print", "2", "--i_weights", "4",
            "--i_img", "0", "--chunk", "64", "--is_train",
        ]
    )
    train_ensemble(args, 2)
    rundir = os.path.join(basedir, "tiny", "triangular", "ens")
    names = os.listdir(rundir)
    assert any(n.endswith("_01") for n in names), names
    assert any(n.endswith("_02") for n in names), names

    summary = eval_ensemble(args, 2)
    assert summary["n_members"] == 2
    assert len(summary["views"]) == 1
    # mixture has M*K = 8 samples; metrics finite
    import numpy as np

    for key in ("psnr", "ssim", "nll", "ause"):
        assert np.isfinite(summary[key])
    outdirs = [d for d in os.listdir(rundir) if d.startswith("eval_ensemble2")]
    assert outdirs
    files = os.listdir(os.path.join(rundir, outdirs[0]))
    assert "metrics.json" in files and any(f.endswith("_std.png") for f in files)

    # subset mixture (--members): drop member 1, eval member 2 alone
    sub = eval_ensemble(args, 2, members=[2])
    assert sub["n_members"] == 1 and sub["members"] == [2]
    for key in ("psnr", "ssim", "nll", "ause"):
        assert np.isfinite(sub[key])
    assert any(d.startswith("eval_ensemble_m2_") for d in os.listdir(rundir))

    # out-of-range / empty subsets fail loudly
    with pytest.raises(ValueError):
        eval_ensemble(args, 2, members=[3])
    with pytest.raises(ValueError):
        eval_ensemble(args, 2, members=[])


def _write_metrics(path, records):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_member_train_psnrs_tagged(tmp_path):
    """Parallel-trained runs: per-member train/psnr_mXX keys."""
    from cfnerf_tpu.cli.ensemble import member_train_psnrs

    path = str(tmp_path / "metrics.jsonl")
    recs = [
        {"step": s, "train/psnr_m01": 30.0 + 0.01 * s,
         "train/psnr_m02": 26.0, "train/psnr_m03": 30.5}
        for s in range(20)
    ]
    _write_metrics(path, recs)
    psnrs = member_train_psnrs(path, 3)
    assert set(psnrs) == {1, 2, 3}
    assert abs(psnrs[2] - 26.0) < 1e-9
    assert psnrs[1] > 30.0 and psnrs[3] == 30.5


def test_member_train_psnrs_serial_segments(tmp_path):
    """Serial runs: untagged records segmented on step resets."""
    from cfnerf_tpu.cli.ensemble import member_train_psnrs

    path = str(tmp_path / "metrics.jsonl")
    recs = []
    for psnr in (29.0, 24.5, 30.2):  # three members in launch order
        recs += [{"step": s, "train/psnr": psnr + 0.001 * s}
                 for s in range(0, 50, 10)]
    _write_metrics(path, recs)
    psnrs = member_train_psnrs(path, 3)
    assert abs(psnrs[1] - 29.0) < 0.1
    assert abs(psnrs[2] - 24.5) < 0.1
    assert abs(psnrs[3] - 30.2) < 0.1

    with pytest.raises(ValueError, match="segment into 3"):
        member_train_psnrs(path, 2)  # wrong member count is loud


def test_auto_member_subset_drops_outlier(tmp_path):
    """The EVAL_r13 scenario: member 2 trains ~4 dB below its peers and
    --members auto drops exactly it."""
    from cfnerf_tpu.cli.ensemble import auto_member_subset

    basedir = str(tmp_path / "logs")
    path = os.path.join(basedir, "spheres", "summaries", "e", "metrics.jsonl")
    recs = [
        {"step": s, "train/psnr_m01": 30.3, "train/psnr_m02": 26.4,
         "train/psnr_m03": 30.1}
        for s in range(0, 100, 10)
    ]
    _write_metrics(path, recs)

    class A:
        pass

    a = A()
    a.basedir, a.dataname, a.expname = basedir, "spheres", "e"
    assert auto_member_subset(a, 3) == [1, 3]
    # a permissive threshold keeps everyone
    assert auto_member_subset(a, 3, threshold_db=10.0) == [1, 2, 3]


def test_member_metric_medians_val_tags(tmp_path):
    """Round 5: the generalized reader pulls any tagged scalar — here the
    held-out val stream the parallel trainer logs per member."""
    from cfnerf_tpu.cli.ensemble import member_metric_medians

    path = str(tmp_path / "metrics.jsonl")
    recs = [
        {"step": s,
         "train/psnr_m01": 30.0, "train/psnr_m02": 30.1, "train/psnr_m03": 29.9,
         "val/psnr_m01": 28.0, "val/psnr_m02": 24.0, "val/psnr_m03": 28.2,
         "val/nll_m01": -6.1, "val/nll_m02": -4.3, "val/nll_m03": -6.2}
        for s in range(0, 100, 10)
    ]
    _write_metrics(path, recs)
    nlls = member_metric_medians(path, 3, "val/nll")
    assert abs(nlls[2] - (-4.3)) < 1e-9 and nlls[1] < -6.0
    psnrs = member_metric_medians(path, 3, "val/psnr")
    assert abs(psnrs[2] - 24.0) < 1e-9

    # a missing val stream fails loudly with the remedy in the message
    bare = str(tmp_path / "bare.jsonl")
    _write_metrics(bare, [{"step": s, "train/psnr": 30.0} for s in range(5)])
    with pytest.raises(ValueError, match="train_psnr instead"):
        member_metric_medians(bare, 1, "val/nll")


def test_auto_member_subset_gate_metrics(tmp_path):
    """The EVAL_r18 scenario: member 2 matches its peers on train PSNR but
    is a held-out calibration outlier — invisible to the train_psnr gate,
    dropped by the val_nll gate; val_psnr catches a held-out PSNR laggard
    (the EVAL_r11 overfit signature)."""
    from cfnerf_tpu.cli.ensemble import auto_member_subset

    basedir = str(tmp_path / "logs")
    path = os.path.join(basedir, "spheres", "summaries", "g", "metrics.jsonl")
    recs = [
        {"step": s,
         # train PSNR: everyone within the 2 dB gate (EVAL_r18: 33.4/32.2/32.5)
         "train/psnr_m01": 33.4, "train/psnr_m02": 32.2, "train/psnr_m03": 32.5,
         # held-out: member 2 ~1.8 nat worse NLL, member 3 4 dB worse PSNR
         "val/psnr_m01": 28.4, "val/psnr_m02": 28.0, "val/psnr_m03": 24.2,
         "val/nll_m01": -6.13, "val/nll_m02": -4.34, "val/nll_m03": -6.16}
        for s in range(0, 100, 10)
    ]
    _write_metrics(path, recs)

    class A:
        pass

    a = A()
    a.basedir, a.dataname, a.expname = basedir, "spheres", "g"
    assert auto_member_subset(a, 3) == [1, 2, 3]  # train gate sees nothing
    assert auto_member_subset(a, 3, gate_metric="val_nll") == [1, 3]
    assert auto_member_subset(a, 3, gate_metric="val_psnr") == [1, 2]
    # permissive NLL threshold keeps everyone (direction: ABOVE median)
    assert auto_member_subset(a, 3, gate_metric="val_nll",
                              threshold_nat=10.0) == [1, 2, 3]
    with pytest.raises(ValueError, match="gate_metric"):
        auto_member_subset(a, 3, gate_metric="train_nll")
