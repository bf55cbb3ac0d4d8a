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
