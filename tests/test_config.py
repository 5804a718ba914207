import os

from cfnerf_tpu.utils.config import parse_args


def test_defaults():
    args = parse_args([])
    assert args.netdepth == 8 and args.netwidth == 256
    assert args.N_samples == 64 and args.K_samples == 64
    assert args.lrate == 5e-4 and args.lrate_decay == 250
    assert args.type_flows == "no_flow"
    assert not args.is_train


def test_train_nf_sh_invocation():
    """The exact flag set of the reference launch script (train_NF.sh)."""
    args = parse_args(
        [
            "--expname", "africa", "--N_rand", "512", "--N_samples", "128",
            "--n_flows", "4", "--h_alpha_size", "64", "--h_rgb_size", "64",
            "--K_samples", "32", "--n_hidden", "128",
            "--type_flows", "triangular", "--beta1", "0.01",
            "--depth_lambda", "0.01", "--netdepth", "8", "--netwidth", "512",
            "--model", "NeRF_Flows", "--index_step", "-1", "--is_train",
        ]
    )
    assert args.expname == "africa"
    assert args.N_rand == 512 and args.N_samples == 128
    assert args.K_samples == 32 and args.n_flows == 4
    assert args.type_flows == "triangular"
    assert args.beta1 == 0.01 and args.depth_lambda == 0.01
    assert args.netwidth == 512 and args.is_train


def test_config_file_and_cli_precedence(tmp_path):
    """Reference config format (configs/africa_ds.txt) with CLI override."""
    cfg = tmp_path / "africa_ds.txt"
    cfg.write_text(
        "dataname = africa\n"
        "basedir = ./logs/NF\n"
        "datadir = ./data/nerf_llff_data/africa\n"
        "dataset_type = llff\n"
        "\n"
        "factor = 2\n"
        "llffhold = 8\n"
        "\n"
        "use_viewdirs = True\n"
        "raw_noise_std = 1e0\n"
        "\n"
        "no_ndc = True\n"
        "colmap_depth = True\n"
    )
    args = parse_args(["--config", str(cfg)])
    assert args.dataname == "africa"
    assert args.factor == 2
    assert args.use_viewdirs is True
    assert args.no_ndc is True and args.colmap_depth is True
    assert args.raw_noise_std == 1.0
    assert args.dataset_type == "llff"

    # CLI beats config file
    args = parse_args(["--config", str(cfg), "--factor", "4", "--dataname", "statue"])
    assert args.factor == 4 and args.dataname == "statue"
    assert args.no_ndc is True  # untouched config value survives


def test_args_txt_none_roundtrip(tmp_path):
    """A run dir's args.txt records unset optional flags as the literal
    `None` (e.g. `model = None`); re-running from --config must restore
    the None OBJECT, not the string "None" — the string broke model
    selection (factory.py lowercases it to 'none' -> 'unknown baseline
    model') when evaluating a finished run via its own args.txt."""
    cfg = tmp_path / "args.txt"
    cfg.write_text(
        "model = None\n"
        "expname = roundtrip\n"
        "k_schedule = None\n"
    )
    args = parse_args(["--config", str(cfg)])
    assert args.model is None
    assert args.k_schedule is None
    assert args.expname == "roundtrip"
