"""Import harness for the live PyTorch reference at /root/reference.

Golden-value parity tests (tests/test_reference_parity.py) import the
reference's actual modules and compare numbers; this module handles the
environment plumbing: stubbing the reference's unavailable soft deps
(skimage / kornia / configargparse are not installed here), putting
/root/reference on sys.path, and porting torch state-dicts into the flax
param pytrees of cfnerf_tpu.

The reference is UNTRUSTED public content: we execute its model code under
test to extract golden values only.
"""
from __future__ import annotations

import sys
import types

import numpy as np


def _stub(name: str, module: types.ModuleType) -> None:
    if name not in sys.modules:
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = module


def install_reference():
    """Stub missing deps and put /root/reference first on sys.path.
    Returns (run_nerf_helpers, models, flows, run_nerf_uncertainty_NF)."""
    import torch

    cfg = types.ModuleType("configargparse")
    cfg.ArgumentParser = object
    _stub("configargparse", cfg)

    sk = types.ModuleType("skimage")
    sk_m = types.ModuleType("skimage.metrics")
    sk_m.structural_similarity = lambda *a, **k: 0.0
    sk.metrics = sk_m
    _stub("skimage", sk)
    _stub("skimage.metrics", sk_m)

    ko = types.ModuleType("kornia")

    def create_meshgrid(H, W, normalized_coordinates=False):
        ys, xs = torch.meshgrid(
            torch.arange(H, dtype=torch.float32),
            torch.arange(W, dtype=torch.float32),
            indexing="ij",
        )
        return torch.stack([xs, ys], -1)[None]

    ko.create_meshgrid = create_meshgrid
    _stub("kornia", ko)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import run_nerf_helpers as ref_helpers  # noqa: E402
    import model.models as ref_models  # noqa: E402
    import model.flow.flows as ref_flows  # noqa: E402
    import run_nerf_uncertainty_NF as ref_main  # noqa: E402

    # the reference enables anomaly detection globally at import; it slows
    # every torch op and is irrelevant for forward-only golden values
    torch.autograd.set_detect_anomaly(False)
    return ref_helpers, ref_models, ref_flows, ref_main


def ref_args(**overrides) -> types.SimpleNamespace:
    """The flag namespace NeRF_Flows/TriangularSylvesterNeRF expect."""
    import torch

    a = types.SimpleNamespace(
        netdepth=4,
        netwidth=32,
        input_ch=63,
        input_ch_views=27,
        K_samples=4,
        skips=[2],
        use_viewdirs=True,
        h_alpha_size=8,
        h_rgb_size=8,
        h_size=8,
        z_size=3,
        n_flows=4,
        type_flows="triangular",
        n_hidden=1,
        device=torch.device("cpu"),
    )
    for k, v in overrides.items():
        setattr(a, k, v)
    return a


def _lin(sd, name):
    """torch Linear state-dict entry -> flax {'kernel','bias'} (transposed).

    Every leaf is COPIED: `tensor.detach().numpy()` aliases torch storage,
    so an in-place torch optimizer step would silently mutate the ported
    pytree (bit us in the lockstep parity harness — biases tracked the
    torch Adam updates while kernels, copied by ascontiguousarray, did not).
    """
    return {
        "kernel": np.ascontiguousarray(sd[f"{name}.weight"].detach().numpy().T),
        "bias": sd[f"{name}.bias"].detach().numpy().copy(),
    }


def port_amortized(ref_flow) -> dict:
    """TriangularSylvesterNeRF -> AmortizedTriangularSylvester params.
    (amor_diag1/2 are Sequential(Linear, Tanh) in the reference: index .0)"""
    sd = ref_flow.state_dict()
    return {
        "amor_d": _lin(sd, "amor_d"),
        "amor_diag1": _lin(sd, "amor_diag1.0"),
        "amor_diag2": _lin(sd, "amor_diag2.0"),
        "amor_b": _lin(sd, "amor_b"),
    }


def port_nerf_flows(ref_model, net_depth: int) -> dict:
    """Reference NeRF_Flows state-dict -> cfnerf_tpu NeRFFlows param pytree.
    The reference's dead heads (alpha_linear, alpha_std_linear) are skipped —
    they are never used in its forward (models.py:59-60)."""
    sd = ref_model.state_dict()
    p = {}
    for i in range(net_depth):
        p[f"pts_linear_{i}"] = _lin(sd, f"pts_linears.{i}")
    p["feature_linear"] = _lin(sd, "feature_linear")
    p["views_linear"] = _lin(sd, "views_linears.0")
    p["h_alpha_linear"] = _lin(sd, "h_alpha_linear")
    p["h_rgb_linear"] = _lin(sd, "h_rgb_linear")
    for name in ("alpha_mean", "alpha_std", "rgb_mean", "rgb_std"):
        p[name] = sd[name].detach().numpy().copy()  # copy: see _lin
    p["flows_alpha"] = port_amortized(ref_model.flows_alpha)
    p["flows_rgb"] = port_amortized(ref_model.flows_rgb)
    return p
