import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.ops.embed import Embedder, get_embedder, positional_encoding


def reference_embed(x, multires):
    """Independent numpy implementation of the reference feature ordering
    (run_nerf_helpers.py:26-51): [x] + per-frequency [sin, cos] blocks."""
    outs = [x]
    freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    for f in freqs:
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, -1)


def test_out_dims():
    emb, dim = get_embedder(10)
    assert dim == 63 and emb.out_dim == 63
    emb, dim = get_embedder(4)
    assert dim == 27


def test_identity_embed():
    emb, dim = get_embedder(10, i_embed=-1)
    assert dim == 3
    x = jnp.array([[0.1, -0.2, 0.3]])
    np.testing.assert_allclose(emb(x), x)


def test_matches_reference_ordering():
    rng = np.random.RandomState(0)
    x = rng.randn(17, 3).astype(np.float32)
    for multires in (4, 10):
        got = np.asarray(positional_encoding(jnp.asarray(x), multires))
        want = reference_embed(x, multires)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batch_shapes():
    emb = Embedder(num_freqs=10, max_freq_log2=9)
    x = jnp.zeros((4, 5, 3))
    assert emb(x).shape == (4, 5, 63)
