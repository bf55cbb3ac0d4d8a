import jax.numpy as jnp
import numpy as np

from hfvo_tpu.ops import fast as fast_ops
from hfvo_tpu.ops.pallas_fast import fast_score_pallas
from hfvo_tpu.testing import synthetic


def test_pallas_fast_matches_jnp_exactly():
    """Interpreter-mode Pallas kernel is bit-identical to the jnp path."""
    T_wc, grays, depths = synthetic.render_sequence(n=1, seed=0)
    img = jnp.asarray(grays[0])
    ref = np.asarray(fast_ops.fast_score(img, 20.0))
    pal = np.asarray(fast_score_pallas(img, 20.0, interpret=True))
    np.testing.assert_array_equal(ref, pal)
    assert (ref > 0).sum() > 100


def test_pallas_fast_non_tile_aligned(rng):
    """Image sizes that don't divide the tile grid still match."""
    img = jnp.asarray(rng.uniform(0, 255, (250, 330)).astype(np.float32))
    ref = np.asarray(fast_ops.fast_score(img, 15.0))
    pal = np.asarray(fast_score_pallas(img, 15.0, interpret=True))
    np.testing.assert_allclose(ref, pal, atol=1e-4)


def test_dual_kernel_matches_two_passes():
    from hfvo_tpu.ops.pallas_fast import fast_score_dual_pallas

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, size=(96, 160)).astype(np.float32)
    lo = np.asarray(fast_score_pallas(img, 7.0, interpret=True))
    hi = np.asarray(fast_score_pallas(img, 20.0, interpret=True))
    want = np.where(hi > 0, hi + 1e4, lo)
    got = np.asarray(
        fast_score_dual_pallas(img, 7.0, 20.0, bonus=1e4, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
