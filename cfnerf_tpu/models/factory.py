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

    flow_impl = getattr(args, "flow_impl", "auto")
    if flow_impl == "auto":
        # fused Pallas kernel on TPU only (measured +16% train throughput);
        # the pltpu kernel would crash on GPU/CPU backends — XLA elsewhere
        flow_impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    # 'NeRF_Flows' is the spelling the reference launch scripts pass
    model_name = (getattr(args, "model", None) or "nerf_flows").lower()

    fused_render = getattr(args, "fused_render", "auto")
    if fused_render == "auto":
        # whole flow+composite as one Pallas kernel (render_core.py):
        # TPU-only, triangular NeRFFlows only (an explicit on/interpret
        # for another family raises in make_fused_apply; the renderer
        # gates shapes/noise at trace time)
        fused_render = (
            "on"
            if (jax.default_backend() == "tpu"
                and model_name == "nerf_flows"
                and args.type_flows == "triangular")
            else "off"
        )

    def _mk(depth, width):
        if model_name != "nerf_flows":
            # baseline family via --model (the reference parses the flag and
            # ignores it; its baselines are dead code — run_nerf_helpers.py:76-284)
            from cfnerf_tpu.models.baseline_adapter import KSampleBaseline

            return KSampleBaseline(
                kind=model_name,
                k_samples=args.K_samples,
                net_depth=depth,
                net_width=width,
                input_ch=input_ch,
                input_ch_views=input_ch_views,
                skips=(depth // 2,),
                use_viewdirs=args.use_viewdirs,
                compute_dtype=compute_dtype,
            )
        return NeRFFlows(
            net_depth=depth,
            net_width=width,
            input_ch=input_ch,
            input_ch_views=input_ch_views,
            skips=(depth // 2,),
            h_alpha_size=args.h_alpha_size,
            h_rgb_size=args.h_rgb_size,
            n_flows=args.n_flows,
            k_samples=args.K_samples,
            use_viewdirs=args.use_viewdirs,
            type_flows=args.type_flows,
            compute_dtype=compute_dtype,
            flow_impl=flow_impl,
            trunk_impl=getattr(args, "trunk_impl", "xla"),
        )

    model = _mk(args.netdepth, args.netwidth)
    model_fine = None
    if args.N_importance > 0:
        # hierarchical fine network (the reference's N_importance flag
        # surface; netdepth_fine/netwidth_fine knobs, :586-589)
        model_fine = _mk(args.netdepth_fine, args.netwidth_fine)

    render_config = RenderConfig(
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        perturb=args.perturb > 0,
        lindisp=getattr(args, "lindisp", False),
        use_viewdirs=args.use_viewdirs,
        white_bkgd=args.white_bkgd,
        raw_noise_std=args.raw_noise_std,
        uniform=getattr(args, "uniformsample", False),
        multires=args.multires,
        multires_views=args.multires_views,
        i_embed=args.i_embed,
        fused=fused_render,
    )
    return model, model_fine, render_config


def loss_mode_for_model(model_name: Optional[str]) -> str:
    """Training-loss family per model: the flow model and the learned-std
    baseline train on the sample-based KDE NLL; the deterministic and
    MC-dropout baselines train on plain MSE (nerf-pytorch semantics — K
    identical/mask-only draws make a KDE bandwidth degenerate)."""
    name = (model_name or "nerf_flows").lower()
    return "mse" if name in ("nerf", "nerf_dropout") else "kde"


def init_params(model: NeRFFlows, seed: int = 0) -> Any:
    x = jnp.zeros((2, model.input_ch + model.input_ch_views), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x, is_test=True)["params"]


def create_nerf(args):
    """Build + auto-resume.

    Returns (model, model_fine, render_config, params, start_step); params
    is the raw coarse pytree when N_importance == 0, else
    {"coarse": ..., "fine": ...}."""
    model, model_fine, render_config = build_model(args)
    params = init_params(model, getattr(args, "seed", 0))
    if model_fine is not None:
        params = {
            "coarse": params,
            "fine": init_params(model_fine, getattr(args, "seed", 0) + 1),
        }

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
    return model, model_fine, render_config, params, start
