"""KF-axis-sharded appearance database == dense database (bow/sharded_db.py).

Reference: KeyFrameDatabase inverted-file queries
(src/KeyFrameDatabase.cc:199,256), here sharded over a device mesh.
"""
import numpy as np
import jax
import pytest

from hfvo_tpu.bow.database import KeyFrameDatabase
from hfvo_tpu.bow.sharded_db import ShardedKeyFrameDatabase
from hfvo_tpu.bow.vocab import N_WORDS


def _rand_hist(rng):
    h = rng.random(N_WORDS).astype(np.float32) ** 8
    return h / h.sum()


def test_sharded_matches_dense():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("kf",))
    rng = np.random.default_rng(0)
    dense = KeyFrameDatabase(64)
    shard = ShardedKeyFrameDatabase(mesh, 64)
    for k in range(40):
        h = _rand_hist(rng)
        dense.add(k, h)
        shard.add(k, h)
    dense.erase(7)
    shard.erase(7)
    for trial in range(5):
        q = _rand_hist(rng)
        ids_d, s_d = dense.query(q, top_k=5, exclude=3)
        ids_s, s_s = shard.query(q, top_k=5, exclude=3)
        assert list(ids_s) == list(ids_d), (ids_s, ids_d)
        np.testing.assert_allclose(s_s, s_d, atol=1e-5)


def test_sharded_query_self_recall():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("kf",))
    rng = np.random.default_rng(1)
    shard = ShardedKeyFrameDatabase(mesh, 32)
    hs = [_rand_hist(rng) for _ in range(20)]
    for k, h in enumerate(hs):
        shard.add(k, h)
    for k in (0, 9, 19):
        ids, scores = shard.query(hs[k])
        assert ids[0] == k
        assert scores[0] > 0.999
