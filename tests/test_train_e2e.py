"""End-to-end smoke: the CLI train path on a tiny synthetic blender scene,
then checkpoint resume and render_only — the de-facto integration test the
reference only had as shell scripts (SURVEY.md section 4)."""
import glob
import json
import os

import numpy as np
import pytest

from tests.datagen import make_blender_dataset, make_llff_dataset

from cfnerf_tpu.utils.config import parse_args
from cfnerf_tpu.train.loop import train


def _base_args(datadir, basedir, extra=()):
    return parse_args(
        [
            "--expname", "t", "--dataname", "tiny", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "blender",
            "--N_rand", "32", "--N_samples", "16", "--K_samples", "4",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "32",
            "--type_flows", "triangular", "--beta1", "0.01",
            "--use_viewdirs", "--white_bkgd", "--no_ndc",
            "--n_iters", "12", "--i_print", "5", "--i_weights", "10",
            "--i_img", "0", "--chunk", "64",
            "--is_train", *extra,
        ]
    )


@pytest.mark.slow
def test_blender_train_ckpt_resume_render(tmp_path):
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")

    args = _base_args(datadir, basedir)
    train(args)

    rundir = os.path.join(basedir, "tiny", "triangular", "t")
    assert os.path.exists(os.path.join(rundir, "args.txt"))
    ckpts = glob.glob(os.path.join(rundir, "0000*"))
    assert any(c.endswith("000010_01") for c in ckpts), ckpts

    # metrics were logged
    mfile = os.path.join(basedir, "tiny", "summaries", "t", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    assert any("train/loss" in r for r in recs)
    assert all(np.isfinite(r.get("train/loss", 0.0)) for r in recs)
    # the internal-val ray stream (reference :877-885 builds it, :954-963
    # slices it per step but never consumes it) is wired here: held-out
    # val/mse + val/psnr logged at the i_print cadence
    assert any("val/mse" in r for r in recs)
    assert all(np.isfinite(r.get("val/mse", 0.0)) for r in recs)
    assert any("val/psnr" in r for r in recs)
    # held-out KDE NLL rides the same stream (round 5: the calibration
    # signal for --gate_metric val_nll and overfit detection)
    assert any("val/nll" in r for r in recs)
    assert all(np.isfinite(r.get("val/nll", 0.0)) for r in recs)

    # resume: starts from step 10 and runs to 12 again (no crash, new ckpt dir kept)
    args2 = _base_args(datadir, basedir)
    train(args2)

    # render_only on the trained weights
    args3 = _base_args(datadir, basedir, extra=["--render_test", "--render_factor", "2"])
    args3.is_train = False
    args3.render_only = True
    train(args3)
    outdirs = glob.glob(os.path.join(rundir, "renderonly_test_*"))
    assert outdirs
    pngs = glob.glob(os.path.join(outdirs[0], "*.png"))
    assert pngs  # rgb + std images written

    # occupancy-accelerated render_only: grid-backed serving at a smaller
    # placed N on the same checkpoint (grid impl — the CPU backend)
    args4 = _base_args(datadir, basedir, extra=[
        "--render_test", "--render_factor", "2",
        "--occ_eval", "8", "--occ_impl", "grid", "--occ_res", "16",
        "--occ_eval_candidates", "32",
    ])
    args4.is_train = False
    args4.render_only = True
    train(args4)
    pngs_occ = glob.glob(os.path.join(outdirs[0], "*.png"))
    assert pngs_occ  # serving path wrote frames without crashing


@pytest.mark.slow
def test_llff_train_smoke(tmp_path):
    datadir = make_llff_dataset(str(tmp_path / "scene"), H=8, W=8, n_images=6)
    basedir = str(tmp_path / "logs")
    args = parse_args(
        [
            "--expname", "l", "--dataname", "fern", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "llff", "--factor", "1",
            "--no_ndc", "--llffhold", "3",
            "--N_rand", "16", "--N_samples", "16", "--K_samples", "4",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "16",
            "--type_flows", "triangular", "--use_viewdirs",
            "--n_iters", "4", "--i_print", "2", "--i_weights", "100",
            "--i_img", "0", "--chunk", "64", "--is_train",
        ]
    )
    train(args)
    mfile = os.path.join(basedir, "fern", "summaries", "l", "metrics.jsonl")
    assert os.path.exists(mfile)


@pytest.mark.slow
def test_minicapture_real_style_e2e(tmp_path):
    """The real-capture path end-to-end on the checked-in miniature
    LLFF+COLMAP fixture (VERDICT r01 task 3): minify (factor 2 Lanczos
    cache) -> NDC rays -> COLMAP sparse-depth supervision -> training ->
    spiral render path, driven through configs/minicapture_ds.txt exactly
    as a user would run configs/fern.txt / africa_ds.txt on real data."""
    import shutil

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixture = os.path.join(repo, "tests", "fixtures", "minicapture")
    datadir = str(tmp_path / "minicapture")
    shutil.copytree(fixture, datadir)
    basedir = str(tmp_path / "logs")

    overrides = [
        "--config", os.path.join(repo, "configs", "minicapture_ds.txt"),
        "--datadir", datadir, "--basedir", basedir, "--expname", "mini",
        # tiny-capacity overrides (CLI wins over the config file)
        "--N_rand", "32", "--N_samples", "16", "--K_samples", "4",
        "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
        "--netdepth", "2", "--netwidth", "32", "--raw_noise_std", "0",
        "--n_iters", "30", "--i_print", "10", "--i_weights", "30",
        "--i_img", "0", "--chunk", "128",
    ]
    args = parse_args(overrides + ["--is_train"])
    assert not args.no_ndc and args.colmap_depth and args.factor == 2
    train(args)

    # minify cache was created on demand inside the capture dir
    assert os.path.isdir(os.path.join(datadir, "images_2"))

    rundir = os.path.join(basedir, "minicapture", "triangular", "mini")
    mfile = os.path.join(basedir, "minicapture", "summaries", "mini",
                         "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    losses = [r["train/loss"] for r in recs if "train/loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    # depth supervision is active: the depth loss term is logged and finite
    assert any("train/depth_loss" in r for r in recs)

    # spiral path render on the trained weights (render_poses from
    # load_llff_data), exercising the NDC eval path
    args2 = parse_args(overrides + ["--render_factor", "4"])
    args2.is_train = False
    args2.render_only = True
    train(args2)
    outdirs = glob.glob(os.path.join(rundir, "renderonly_path_*"))
    assert outdirs, os.listdir(rundir)
    assert glob.glob(os.path.join(outdirs[0], "*.png"))


@pytest.mark.slow
def test_i_testset_export(tmp_path):
    """--i_testset renders the held-out set to testset_{step:06d}/
    (implemented intended behavior; the reference's path crashes)."""
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = _base_args(datadir, basedir, extra=["--i_testset", "10",
                                               "--render_factor", "2"])
    train(args)
    rundir = os.path.join(basedir, "tiny", "triangular", "t")
    testdirs = glob.glob(os.path.join(rundir, "testset_*"))
    assert testdirs, os.listdir(rundir)
    assert glob.glob(os.path.join(testdirs[0], "*.png"))


def test_baseline_model_cli(tmp_path):
    """--model nerf_dropout trains through the same loop (MSE loss mode)."""
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = _base_args(datadir, basedir, extra=["--model", "nerf_dropout"])
    train(args)
    mfile = os.path.join(basedir, "tiny", "summaries", "t", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    assert recs and all(np.isfinite(r.get("train/loss", 0.0)) for r in recs)


@pytest.mark.slow
def test_scan_trainer_n_inner(tmp_path):
    """--n_inner > 1: device-resident scan over inner steps, cadences on
    crossing detection."""
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = _base_args(datadir, basedir, extra=["--n_inner", "4"])
    args.n_iters = 12
    train(args)
    rundir = os.path.join(basedir, "tiny", "triangular", "t")
    # i_weights=10 crossing fires within the 12 steps
    assert glob.glob(os.path.join(rundir, "0000*")), os.listdir(rundir)
    mfile = os.path.join(basedir, "tiny", "summaries", "t", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    assert recs and all(np.isfinite(r.get("train/loss", 0.0)) for r in recs)


@pytest.mark.slow
def test_i_video_spiral_export(tmp_path):
    """--i_video renders the spiral path and writes rgb/disp videos (PNG
    frames when no ffmpeg); the reference's path crashes (undefined var)."""
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = _base_args(datadir, basedir, extra=["--i_video", "10",
                                               "--render_factor", "2"])
    train(args)
    rundir = os.path.join(basedir, "tiny", "triangular", "t")
    outputs = glob.glob(os.path.join(rundir, "t_spiral_*"))
    assert outputs, os.listdir(rundir)


@pytest.mark.slow
def test_profiler_trace_export(tmp_path):
    """--profile_dir writes a jax.profiler trace for the configured step
    window (the tracing state machine lives in the refactored loop closure)."""
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    profdir = str(tmp_path / "prof")
    args = _base_args(datadir, basedir, extra=[
        "--profile_dir", profdir, "--profile_start", "2", "--profile_steps", "3",
    ])
    train(args)
    import glob as _glob
    traces = _glob.glob(os.path.join(profdir, "**", "*.trace.json*"),
                        recursive=True) + _glob.glob(
        os.path.join(profdir, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no trace written under {profdir}"


@pytest.mark.slow
def test_blender_train_model_parallel(tmp_path):
    """--model_parallel 2: the CLI train loop on a 2-D (4 data x 2 model)
    mesh with the trunk width tensor-parallel (shard_params_tp)."""
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8)
    basedir = str(tmp_path / "logs")
    args = _base_args(datadir, basedir, extra=["--model_parallel", "2"])
    train(args)

    import json

    mfile = os.path.join(basedir, "tiny", "summaries", "t", "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    losses = [r["train/loss"] for r in recs if "train/loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
