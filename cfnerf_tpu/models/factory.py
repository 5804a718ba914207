"""Model factory — the create_nerf() equivalent.

Parity target: /root/reference/run_nerf_uncertainty_NF.py:317-409: build
embedders (fixing input_ch/input_ch_views from multires), set
skips=[netdepth/2], instantiate NeRF_Flows, wrap for multi-device
execution, build the optimizer, and auto-resume from the newest checkpoint.

TPU-native: instead of nn.DataParallel the "wrap" is a jax mesh created by
the caller; this factory returns the flax module + fresh/restored params.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.ops.embed import get_embedder
from cfnerf_tpu.render.renderer import RenderConfig
from cfnerf_tpu.train import checkpoint as ckpt


def build_model(args) -> Tuple[NeRFFlows, RenderConfig]:
    """Construct the flagship model + render config from the parsed flag
    namespace (reference create_nerf, :317-341)."""
    _, input_ch = get_embedder(args.multires, args.i_embed)
    input_ch_views = 0
    if args.use_viewdirs:
        _, input_ch_views = get_embedder(args.multires_views, args.i_embed)

    skips = (args.netdepth // 2,)  # reference: [netdepth/2] (:327)
    compute_dtype = jnp.bfloat16 if getattr(args, "compute_dtype", "float32") == "bfloat16" else jnp.float32

    model = NeRFFlows(
        net_depth=args.netdepth,
        net_width=args.netwidth,
        input_ch=input_ch,
        input_ch_views=input_ch_views,
        skips=skips,
        h_alpha_size=args.h_alpha_size,
        h_rgb_size=args.h_rgb_size,
        n_flows=args.n_flows,
        k_samples=args.K_samples,
        use_viewdirs=args.use_viewdirs,
        type_flows=args.type_flows,
        compute_dtype=compute_dtype,
    )

    render_config = RenderConfig(
        n_samples=args.N_samples,
        perturb=args.perturb > 0,
        lindisp=getattr(args, "lindisp", False),
        use_viewdirs=args.use_viewdirs,
        white_bkgd=args.white_bkgd,
        raw_noise_std=args.raw_noise_std,
        uniform=getattr(args, "uniformsample", False),
        multires=args.multires,
        multires_views=args.multires_views,
        i_embed=args.i_embed,
    )
    return model, render_config


def init_params(model: NeRFFlows, seed: int = 0) -> Any:
    x = jnp.zeros((2, model.input_ch + model.input_ch_views), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x, is_test=True)["params"]


def create_nerf(args) -> Tuple[NeRFFlows, RenderConfig, Any, int]:
    """Build + auto-resume. Returns (model, render_config, params, start_step)."""
    model, render_config = build_model(args)
    params = init_params(model, getattr(args, "seed", 0))

    rundir = ckpt.run_dir(args.basedir, args.dataname, args.type_flows, args.expname)
    start = 0
    if not args.no_reload:
        path = ckpt.find_resume_checkpoint(
            rundir, ft_path=args.ft_path, index_step=args.index_step,
            ensemble=args.index_ensembles,
        )
        if path is not None:
            print("Reloading from", path)
            params, start = ckpt.restore_checkpoint(path, params)
        else:
            print("No reloading")
    else:
        print("No reloading")
    return model, render_config, params, start
