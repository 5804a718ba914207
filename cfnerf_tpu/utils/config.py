"""Config/flag system — configargparse-compatible without the dependency.

Parity target: config_parser(), /root/reference/run_nerf_uncertainty_NF.py:556-719
(the full ~60-flag surface) plus the `key = value` config-file format of
configs/*.txt (e.g. /root/reference/configs/africa_ds.txt).  Precedence
matches configargparse: defaults < config file < explicit CLI flags.

The same flag names and semantics are accepted so reference launch scripts
(train_NF.sh / test_NF.sh) port by changing only the entry-point module.
"""
from __future__ import annotations

import argparse
import sys
from typing import List, Optional, Sequence


def _parse_config_file(path: str) -> dict:
    """Parse a `key = value` txt config (configargparse DefaultConfigFileParser
    subset: comments with #/;, bare keys mean True)."""
    values = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", ";")):
                continue
            if "=" in line:
                key, _, val = line.partition("=")
                values[key.strip()] = val.strip()
            else:
                values[line] = "true"
    return values


class ConfigArgumentParser(argparse.ArgumentParser):
    """argparse with a --config file layer (configargparse work-alike)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._config_flag_names = set()

    def add_config_argument(self, *names, **kwargs):
        self._config_flag_names.update(names)
        kwargs.setdefault("help", "config file path")
        return super().add_argument(*names, type=str, default=None)

    def parse_args(self, args: Optional[Sequence[str]] = None, namespace=None):  # type: ignore[override]
        if args is None:
            args = sys.argv[1:]
        args = list(args)

        # find --config value without consuming other args
        pre = argparse.ArgumentParser(add_help=False)
        for name in self._config_flag_names or ("--config",):
            pre.add_argument(name, type=str, default=None, dest="config")
        known, _ = pre.parse_known_args(args)

        ns = super().parse_args(args, namespace)
        if getattr(known, "config", None):
            file_vals = _parse_config_file(known.config)
            explicit = self._explicit_dests(args)
            str_actions = {a.dest: a for a in self._actions}
            for key, raw in file_vals.items():
                dest = key.replace("-", "_")
                if dest not in str_actions or dest in explicit:
                    continue
                action = str_actions[dest]
                setattr(ns, dest, self._coerce(action, raw))
        return ns

    def _explicit_dests(self, args: List[str]) -> set:
        """Dests explicitly given on the CLI (these beat the config file)."""
        explicit = set()
        for a in self._actions:
            for opt in a.option_strings:
                if opt in args or any(x.startswith(opt + "=") for x in args):
                    explicit.add(a.dest)
        return explicit

    @staticmethod
    def _coerce(action: argparse.Action, raw: str):
        raw_stripped = raw.strip().strip("'\"")
        if isinstance(action, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
            return raw_stripped.lower() in ("true", "1", "yes")
        if raw_stripped == "None":
            # args.txt round-trip: run dirs record unset optional flags as
            # the literal `None` (mirroring the reference's args.txt dumps);
            # reading that back as the STRING "None" broke e.g. --model
            # ("unknown baseline model 'none'") when re-running from --config.
            return None
        if action.type is not None:
            return action.type(raw_stripped)
        return raw_stripped


def config_parser() -> ConfigArgumentParser:
    """The full reference flag surface (run_nerf_uncertainty_NF.py:556-719)."""
    # allow_abbrev=False: with prefix abbreviation, an explicitly passed
    # abbreviated flag (--lrate_d 500) is missed by the explicit-dest scan
    # and a config-file value would silently override it, inverting the
    # documented defaults < config < CLI precedence
    parser = ConfigArgumentParser(allow_abbrev=False)
    parser.add_config_argument("--config")
    parser.add_argument("--expname", type=str, help="experiment name")
    parser.add_argument("--dataname", type=str, default="leaves", help="data name")
    parser.add_argument("--basedir", type=str, default="./logs/", help="where to store ckpts and logs")
    parser.add_argument("--datadir", type=str, default="./data/llff/fern", help="input data directory")

    # training options
    parser.add_argument("--is_train", action="store_true", help="train or evaluate")
    parser.add_argument("--uniformsample", action="store_true", help="use uniform z samples")
    parser.add_argument("--optimize_global", action="store_true")
    parser.add_argument("--optimize_skip", type=int, default=2)
    parser.add_argument("--use_prior", action="store_true")
    parser.add_argument("--netdepth", type=int, default=8, help="layers in network")
    parser.add_argument("--netwidth", type=int, default=256, help="channels per layer")
    parser.add_argument("--netdepth_fine", type=int, default=8)
    parser.add_argument("--netwidth_fine", type=int, default=256)

    parser.add_argument("--model", type=str, default=None,
                        choices=[None, "nerf_flows", "NeRF_Flows", "nerf",
                                 "nerf_dropout", "nerf_wild"],
                        help="model family: the CF-NeRF flow model (default) "
                             "or an uncertainty baseline (vanilla / "
                             "MC-dropout / learned-std)")
    parser.add_argument("--N_rand", type=int, default=512, help="rays per gradient step")
    parser.add_argument("--lrate", type=float, default=5e-4)
    parser.add_argument("--lrate_unc", type=float, default=5e-4)
    parser.add_argument("--lrate_decay", type=int, default=250, help="exp lr decay (in 1000 steps)")
    parser.add_argument("--chunk", type=int, default=1024 * 8, help="eval-render ray tile size")
    parser.add_argument("--netchunk_per_gpu", type=int, default=1024 * 64,
                        help="accepted for launch-script compatibility; the TPU path has no netchunk loop")
    parser.add_argument("--no_batching", action="store_true", help="sample rays from one image at a time")
    parser.add_argument("--no_reload", action="store_true")
    parser.add_argument("--ft_path", type=str, default=None)

    # flow options
    parser.add_argument("--type_flows", type=str, default="no_flow",
                        choices=["planar", "IAF", "realnvp", "glow", "orthogonal",
                                 "householder", "triangular", "no_flow"])
    parser.add_argument("--n_flows", type=int, default=4)
    parser.add_argument("--n_hidden", type=int, default=128)
    parser.add_argument("--h_alpha_size", type=int, default=32)
    parser.add_argument("--h_rgb_size", type=int, default=64)
    parser.add_argument("--z_size", type=int, default=4)

    # rendering options
    parser.add_argument("--N_samples", type=int, default=64)
    parser.add_argument("--K_samples", type=int, default=64)
    parser.add_argument("--N_importance", type=int, default=0)
    parser.add_argument("--N_importance_eval", type=int, default=0,
                        help="EVAL-ONLY importance placement: at evaluation, "
                             "resample this many extra depths from the "
                             "coarse weights and re-query the SAME trained "
                             "network (no fine net, zero training cost); "
                             "lets a low-N_samples training config recover "
                             "sampling density at test time")
    parser.add_argument("--occ_eval", type=int, default=0,
                        help="EVAL-ONLY occupancy-grid sample placement: "
                             "bake the trained density into a voxel grid, "
                             "then render held-out views with this many "
                             "samples per ray placed by inverse-CDF over "
                             "grid-composited visibility weights (0 = off). "
                             "A handful of gathers per ray replaces the "
                             "dense z-schedule, so inference throughput "
                             "scales ~N_samples/occ_eval at matched "
                             "PSNR/SSIM/AUSE (ops/occupancy.py).  KNOWN "
                             "TRADEOFF: concentrating samples at surfaces "
                             "tightens the K-sample spread, so KDE-NLL "
                             "shifts ~+0.5 nat at N16 vs dense (EVAL_r06); "
                             "raise --occ_floor (e.g. 0.3) to recover "
                             "spread, or eval dense when NLL is the metric")
    parser.add_argument("--occ_train", type=int, default=0,
                        help="proposal-placed TRAINING: after a dense "
                             "warmup (--occ_train_from steps at N_samples), "
                             "train with this many samples/ray placed by a "
                             "co-trained proposal MLP (0 = off).  Step cost "
                             "scales ~occ_train/N_samples; the proposal "
                             "rides in the optimizer state (not the "
                             "checkpoint) and is re-distilled on resume")
    parser.add_argument("--occ_train_from", type=int, default=0,
                        help="global step at which placed sampling begins")
    parser.add_argument("--occ_impl", default="auto",
                        choices=["auto", "grid", "proposal"],
                        help="density-proxy backend for --occ_eval: 'grid' "
                             "= baked voxel grid (nearest-cell gather — "
                             "fine on CPU, slow on TPU), 'proposal' = tiny "
                             "MLP distilled from the trained density (pure "
                             "matmuls — the TPU serving path), 'auto' = "
                             "proposal on TPU else grid")
    parser.add_argument("--occ_res", type=int, default=128,
                        help="occupancy grid resolution per axis (grid impl)")
    parser.add_argument("--occ_candidates", type=int, default=128,
                        help="candidate bins per ray for TRAIN-side "
                             "placement (128 is the EVAL_r06/r07 validated "
                             "point; EVAL_r14/r15: coarser grids cost "
                             "quality where gradients flow through "
                             "placement)")
    parser.add_argument("--occ_eval_candidates", type=int, default=32,
                        help="candidate bins per ray for SERVING-side "
                             "placement (--occ_eval / render_only): "
                             "EVAL_r17+r23 measured quality FLAT across C "
                             "in {32..192} (max 0.024 dB) with C=32 "
                             "serving 1.20x faster than 128 — 32 is the "
                             "default; 0 falls back to --occ_candidates")
    parser.add_argument("--occ_floor", type=float, default=0.3,
                        help="uniform mixture mass in the placement pdf: "
                             "free-space coverage for the composite and the "
                             "K-sample spread (0.3 is the validated "
                             "operating point for BOTH --occ_eval and "
                             "--occ_train — EVAL_r06/r07; 0.01 measured "
                             "-3 dB on occ training)")
    parser.add_argument("--occ_floor_start", type=float, default=1.0,
                        help="with --occ_floor_anneal: the floor value at "
                             "the occ-stage boundary (1.0 = near-uniform "
                             "placement, i.e. stratified sampling) before "
                             "annealing down to --occ_floor")
    parser.add_argument("--occ_floor_anneal", type=int, default=0,
                        help="anneal the placement floor linearly from "
                             "--occ_floor_start to --occ_floor over this "
                             "many steps after --occ_train_from (0 = static "
                             "floor).  Softens the dense->placed boundary "
                             "and enables --occ_train_from 0 (no dense "
                             "warmup): placement starts uniform while the "
                             "proposal co-trains from scratch")
    parser.add_argument("--occ_train_until", type=int, default=0,
                        help="global step at which placed sampling ends and "
                             "training returns to the dense N_samples "
                             "schedule (0 = train placed to the end).  A "
                             "short dense cooldown re-exposes the full ray "
                             "to the K-sample machinery (calibration/NLL "
                             "recovery lever)")
    parser.add_argument("--occ_dilate", type=int, default=1,
                        help="3x3x3 max-pool dilation passes on the baked grid")
    parser.add_argument("--early_stop_val", type=int, default=0,
                        help="stop training when held-out val/psnr (the "
                             "internal-val ray stream, logged at i_print "
                             "cadence) has not improved for this many "
                             "consecutive val evaluations (0 = off).  The "
                             "reference builds the val stream and never "
                             "consumes it (run_nerf_uncertainty_NF.py"
                             ":877-885, :954-963)")
    parser.add_argument("--early_stop_min_delta", type=float, default=0.01,
                        help="minimum val/psnr improvement (dB) that resets "
                             "the --early_stop_val patience counter")
    parser.add_argument("--perturb", type=float, default=1.0)
    parser.add_argument("--use_viewdirs", action="store_true")
    parser.add_argument("--i_embed", type=int, default=0)
    parser.add_argument("--multires", type=int, default=10)
    parser.add_argument("--multires_views", type=int, default=4)
    parser.add_argument("--raw_noise_std", type=float, default=0.0)

    parser.add_argument("--render_only", action="store_true")
    parser.add_argument("--render_test", action="store_true")
    parser.add_argument("--render_factor", type=int, default=0)

    # loss weights / precrop
    parser.add_argument("--beta1", type=float, default=0.0)
    parser.add_argument("--beta_u", type=float, default=0.1)
    parser.add_argument("--beta_p", type=float, default=0.05)
    parser.add_argument("--precrop_iters", type=int, default=0)
    parser.add_argument("--precrop_frac", type=float, default=0.5)

    parser.add_argument("--colmap_depth", action="store_true")
    parser.add_argument("--depth_lambda", type=float, default=0.1)

    # dataset options
    parser.add_argument("--dataset_type", type=str, default="llff")
    parser.add_argument("--testskip", type=int, default=8)
    parser.add_argument("--shape", type=str, default="greek")
    parser.add_argument("--white_bkgd", action="store_true")
    parser.add_argument("--half_res", action="store_true")
    parser.add_argument("--factor", type=int, default=8)
    parser.add_argument("--no_ndc", action="store_true")
    parser.add_argument("--lindisp", action="store_true")
    parser.add_argument("--spherify", action="store_true")
    parser.add_argument("--llffhold", type=int, default=8)

    # logging/saving options
    parser.add_argument("--i_print", type=int, default=100)
    parser.add_argument("--i_img", type=int, default=1000)
    parser.add_argument("--i_weights", type=int, default=10000)
    parser.add_argument("--i_testset", type=int, default=10000000)
    parser.add_argument("--i_video", type=int, default=5000000)

    # ensemble settings
    parser.add_argument("--index_ensembles", type=int, default=1)
    parser.add_argument("--index_step", type=int, default=-1)

    # --- TPU-native extensions (not in the reference) ---
    parser.add_argument("--n_iters", type=int, default=100000, help="training iterations")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"], help="MLP trunk matmul dtype")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="devices in the data mesh (0 = all)")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="model-axis size of a 2-D (data x model) "
                             "mesh; the trunk/head widths are tensor-"
                             "parallel via shard_params_tp (GSPMD inserts "
                             "the collectives). The CF-NeRF model fits "
                             "replicated, so this is the pod-scale door, "
                             "not a single-host win")
    parser.add_argument("--seed", type=int, default=0, help="global PRNG seed")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (numerics sanitizer; the "
                             "reference runs torch anomaly mode globally)")
    parser.add_argument("--debug_infs", action="store_true",
                        help="enable jax_debug_infs (the inf half of the "
                             "reference's DEBUG NaN/Inf scan over render "
                             "outputs, run_nerf_uncertainty_NF.py:549-551)")
    parser.add_argument("--flow_impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas", "interpret"],
                        help="triangular flow stack implementation: fused "
                             "Pallas TPU kernel or XLA elementwise chain "
                             "(auto = pallas on TPU, xla elsewhere)")
    parser.add_argument("--k_schedule", type=str, default="",
                        help="piecewise-constant Monte-Carlo sample-count "
                             "schedule 'K:start_step,...' (e.g. "
                             "'8:0,16:2000,32:5000'); step cost is ~linear "
                             "in K, so ramping K spends samples only once "
                             "the distribution matters; K is not a "
                             "parameter axis — checkpoints and eval are "
                             "unchanged (empty = fixed --K_samples)")
    parser.add_argument("--fused_render", type=str, default="auto",
                        choices=["auto", "on", "off", "interpret"],
                        help="fuse flows + K-sample composite into one "
                             "Pallas kernel (ops/pallas/render_core.py); "
                             "auto = on for triangular flows on TPU, off "
                             "elsewhere; falls back per-batch when shapes "
                             "are unsupported, and always when density "
                             "noise is active (--raw_noise_std > 0) — the "
                             "kernel does not model the noise draw")
    parser.add_argument("--trunk_impl", type=str, default="xla",
                        choices=["xla", "pallas", "interpret"],
                        help="trunk MLP implementation; the fused Pallas "
                             "kernel is measured slower than XLA at the "
                             "flagship batch (see ops/pallas/trunk.py) but "
                             "kept as an option")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of steps "
                             "[profile_start, profile_start+profile_steps)")
    parser.add_argument("--profile_start", type=int, default=10)
    parser.add_argument("--profile_steps", type=int, default=5)
    parser.add_argument("--n_inner", type=int, default=1,
                        help="optimizer steps per device dispatch (lax.scan "
                             "inner loop); >1 amortizes host latency — "
                             "logging cadences are rounded to multiples")
    return parser


# Flags that are parsed for reference launch-script compatibility but have
# no effect, mapped to the reason.  The reference itself parses-and-ignores
# all of these (verified: no read site in run_nerf_uncertainty_NF.py other
# than config_parser); we warn loudly instead of silently accepting a
# non-default value.
IGNORED_FLAGS = {
    "lrate_unc": "single optimizer; the reference never builds a second one",
    "beta_u": "loss weight never read by the reference loss block (:1026-1062)",
    "beta_p": "loss weight never read by the reference loss block (:1026-1062)",
    "optimize_global": "no read site in the reference",
    "optimize_skip": "no read site in the reference",
    "use_prior": "no read site in the reference (NeRF_Flows is 'no prior')",
    "z_size": "forced to 3 by the reference model (models.py:31)",
    "n_hidden": "only read by the dead IAF path in the reference",
    "shape": "deepvoxels leftover; no deepvoxels loader exists",
    "netchunk_per_gpu": "the TPU path has no netchunk loop (one fused jit)",
}

_IGNORED_DEFAULTS = {
    "lrate_unc": 5e-4, "beta_u": 0.1, "beta_p": 0.05,
    "optimize_global": False, "optimize_skip": 2, "use_prior": False,
    "z_size": 4, "n_hidden": 128, "shape": "greek",
    "netchunk_per_gpu": 1024 * 64,
}


def warn_ignored_flags(args) -> List[str]:
    """Warn (stderr) for every accepted-but-unwired flag set to a
    non-default value; returns the list of warned flag names."""
    warned = []
    for name, reason in IGNORED_FLAGS.items():
        if getattr(args, name, _IGNORED_DEFAULTS[name]) != _IGNORED_DEFAULTS[name]:
            print(
                f"WARNING: --{name} is accepted for launch-script "
                f"compatibility but has no effect ({reason})",
                file=sys.stderr,
            )
            warned.append(name)
    return warned


def parse_args(argv: Optional[Sequence[str]] = None):
    return config_parser().parse_args(argv)
