"""Golden parity for the conv flow building blocks and the other
dead-in-the-reference symbols revived for full inventory coverage:
GatedConv2d / GatedConvTranspose2d / MaskedConv2d
(/root/reference/model/flow/layers.py:16-58,132-204), the Keras weight
importer (run_nerf_helpers.py:136-163), and get_rays_phototourism
(run_nerf_helpers.py:324-347) — each compared value-for-value against the
live torch reference."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_harness import install_reference


def _to_hwio(w_oihw):
    return np.transpose(w_oihw.detach().numpy(), (2, 3, 1, 0))


def _nhwc(x_nchw):
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


def _ref_layers():
    install_reference()
    import model.flow.layers as ref_layers  # /root/reference/model/flow/layers.py
    return ref_layers


def test_gated_conv2d_matches_reference():
    ref_layers = _ref_layers()
    import jax

    from cfnerf_tpu.flows.conv_layers import GatedConv2d

    torch.manual_seed(0)
    for act_t, act_j in ((None, None), (torch.nn.ELU(), jax.nn.elu)):
        ref = ref_layers.GatedConv2d(4, 6, kernel_size=3, stride=1, padding=1,
                                     activation=act_t)
        ours = GatedConv2d(features=6, kernel_size=(3, 3), strides=(1, 1),
                           padding=(1, 1), activation=act_j)
        x_t = torch.randn(2, 4, 5, 7)
        params = {
            "h": {"kernel": _to_hwio(ref.h.weight),
                  "bias": ref.h.bias.detach().numpy()},
            "g": {"kernel": _to_hwio(ref.g.weight),
                  "bias": ref.g.bias.detach().numpy()},
        }
        got = ours.apply({"params": params}, _nhwc(x_t))
        want = _nhwc(ref(x_t))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_gated_conv_transpose2d_matches_reference():
    ref_layers = _ref_layers()
    import jax

    from cfnerf_tpu.flows.conv_layers import GatedConvTranspose2d

    torch.manual_seed(1)
    # stride-2 upsample with padding + output_padding: the geometry the
    # original VAE-flow decoders used
    ref = ref_layers.GatedConvTranspose2d(
        3, 5, kernel_size=3, stride=2, padding=1, output_padding=1,
        activation=torch.nn.ReLU(),
    )
    ours = GatedConvTranspose2d(
        features=5, kernel_size=(3, 3), strides=(2, 2), padding=(1, 1),
        output_padding=(1, 1), activation=jax.nn.relu,
    )
    x_t = torch.randn(2, 3, 6, 4)

    def tconv_kernel(w_iohw):
        # torch ConvTranspose2d weight is (in, out, kh, kw); our module
        # stores the UNFLIPPED (kh, kw, in, out) kernel and flips in-op
        return np.transpose(w_iohw.detach().numpy(), (2, 3, 0, 1))

    params = {
        "h_kernel": tconv_kernel(ref.h.weight),
        "h_bias": ref.h.bias.detach().numpy(),
        "g_kernel": tconv_kernel(ref.g.weight),
        "g_bias": ref.g.bias.detach().numpy(),
    }
    got = ours.apply({"params": params}, _nhwc(x_t))
    want = _nhwc(ref(x_t))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_in,n_out,diag", [(4, 8, False), (4, 8, True),
                                             (8, 4, False), (8, 4, True),
                                             (6, 6, True)])
def test_masked_conv2d_matches_reference(n_in, n_out, diag):
    ref_layers = _ref_layers()
    from cfnerf_tpu.flows.conv_layers import MaskedConv2d, build_pixelcnn_mask

    # the reference calls the long-removed nn.init.kaiming_normal (torch<1
    # spelling) in reset_parameters — alias it so the dead class is runnable
    if not hasattr(torch.nn.init, "kaiming_normal"):
        torch.nn.init.kaiming_normal = torch.nn.init.kaiming_normal_
    torch.manual_seed(2)
    ref = ref_layers.MaskedConv2d(n_in, n_out, device="cpu",
                                  size_kernel=(3, 3), diagonal_zeros=diag)

    # identical mask semantics (reference mask is (out, in, kh, kw))
    ref_mask = ref.mask.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        build_pixelcnn_mask(n_in, n_out, (3, 3), diag), ref_mask
    )

    ours = MaskedConv2d(features=n_out, size_kernel=(3, 3), diagonal_zeros=diag)
    x_t = torch.randn(2, n_in, 5, 5)
    params = {"kernel": _to_hwio(ref.weight),
              "bias": ref.bias.detach().numpy()}
    got = ours.apply({"params": params}, _nhwc(x_t))
    want = _nhwc(ref(x_t))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_get_rays_phototourism_matches_reference():
    ref_helpers, _, _, _ = install_reference()
    from cfnerf_tpu.ops.rays import get_ray_directions, get_rays_phototourism

    K = np.array([[30.0, 0, 8.5], [0, 28.0, 6.0], [0, 0, 1.0]], np.float32)
    dirs = get_ray_directions(12, 17, K)
    rng = np.random.RandomState(0)
    # a rigid c2w with nontrivial rotation
    q, _ = np.linalg.qr(rng.randn(3, 3))
    c2w = np.concatenate([q, rng.randn(3, 1)], 1).astype(np.float32)

    ro, rd = get_rays_phototourism(dirs, c2w)
    ro_t, rd_t = ref_helpers.get_rays_phototourism(
        torch.from_numpy(dirs), torch.from_numpy(c2w)
    )
    np.testing.assert_allclose(ro, ro_t.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(rd, rd_t.numpy(), rtol=1e-5, atol=1e-6)


def test_keras_weight_import_matches_reference():
    ref_helpers, _, _, _ = install_reference()
    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.models.nerf import NeRF, load_weights_from_keras

    D, W, IN, INV = 8, 32, 10, 6
    rng = np.random.RandomState(3)
    shapes = [(IN, W)] + [((W + IN) if i == 5 else W, W) for i in range(1, D)]
    shapes += [(W, W), (W + INV, W // 2), (W // 2, 3), (W, 1)]
    weights = []
    for s in shapes:
        weights.append(rng.randn(*s).astype(np.float32) * 0.1)  # kernel (in, out)
        weights.append(rng.randn(s[1]).astype(np.float32) * 0.1)  # bias

    ref = ref_helpers.NeRF(D=D, W=W, input_ch=IN, input_ch_views=INV,
                           skips=[4], use_viewdirs=True)
    ref.load_weights_from_keras(weights)

    ours = NeRF(depth=D, width=W, input_ch=IN, input_ch_views=INV, skips=(4,),
                use_viewdirs=True)
    fresh = ours.init(jax.random.PRNGKey(0), jnp.zeros((2, IN + INV)))["params"]
    params = load_weights_from_keras(fresh, weights, depth=D)

    x = rng.randn(64, IN + INV).astype(np.float32)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
