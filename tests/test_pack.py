"""Round-trip tests for the tight uint8 result packing (utils/pack.py).

The packed buffer is the single D2H transfer of the fused per-frame
program; every leaf dtype the fused result uses must survive the
bitcast/bitpack encode (device) -> view/unpackbits decode (host) cycle
bit-exactly, in both single and vmapped (batch) layouts.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hfvo_tpu.utils import pack as pack_utils


def _tree(rng):
    return {
        "f32": rng.normal(size=(17, 3)).astype(np.float32),
        "i32": rng.integers(-(2**31), 2**31 - 1, size=(33,), dtype=np.int32),
        "u32": rng.integers(0, 2**32 - 1, size=(9, 8), dtype=np.uint32),
        "u16": rng.integers(0, 2**16 - 1, size=(11, 5), dtype=np.uint16),
        "u8": rng.integers(0, 255, size=(13,), dtype=np.uint8),
        "bool_odd": rng.random(size=(37,)) > 0.5,  # not a multiple of 8
        "bool_2d": rng.random(size=(6, 9)) > 0.3,
        "scalar": np.float32(3.25),
        "scalar_bool": np.bool_(True),
    }


def _spec_of(tree):
    sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape, np.asarray(a).dtype),
        tree,
    )
    return pack_utils.tree_spec(sds)


def test_roundtrip_single():
    tree = _tree(np.random.default_rng(0))
    meta = _spec_of(tree)
    buf = jax.jit(lambda t: pack_utils.pack(t))(
        jax.tree.map(jnp.asarray, tree)
    )
    assert buf.dtype == jnp.uint8
    assert buf.shape[0] == pack_utils.packed_nbytes(meta)
    out = pack_utils.unpack(np.asarray(buf), meta)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(tree[k]), err_msg=k)


def test_roundtrip_batch():
    rngs = [np.random.default_rng(i) for i in range(4)]
    trees = [_tree(r) for r in rngs]
    meta = _spec_of(trees[0])
    vpack = jax.jit(jax.vmap(lambda t: pack_utils.pack(t)))
    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)
    buf = vpack(stacked)
    assert buf.shape == (4, pack_utils.packed_nbytes(meta))
    out = pack_utils.unpack(np.asarray(buf), meta, batch=True)
    for b in range(4):
        for k in trees[0]:
            np.testing.assert_array_equal(
                np.asarray(out[k][b]), np.asarray(trees[b][k]), err_msg=f"{k}[{b}]"
            )


def test_bool_bitpack_is_8x():
    """A bool leaf costs ceil(n/8) bytes (+pad), not 4n — the whole point
    of the tight container on a bandwidth-bound transport."""
    sds = {"m": jax.ShapeDtypeStruct((8192,), np.bool_)}
    meta = pack_utils.tree_spec(sds)
    assert pack_utils.packed_nbytes(meta) == 1024


def test_non_contiguous_host_buffer():
    """unpack must accept a non-contiguous slice (the batch runner slices
    rows out of the pulled (S, nbytes) buffer)."""
    tree = _tree(np.random.default_rng(7))
    meta = _spec_of(tree)
    buf = np.asarray(jax.jit(pack_utils.pack)(jax.tree.map(jnp.asarray, tree)))
    wide = np.zeros((2, buf.shape[0] + 8), np.uint8)
    wide[1, 4:-4] = buf
    out = pack_utils.unpack(wide[1, 4:-4], meta)
    np.testing.assert_array_equal(np.asarray(out["f32"]), tree["f32"])


def test_pack_split_roundtrip():
    """pack_split + unpack_main/unpack_big_leaves/fill_big reproduce the
    tree exactly; keyframe-only leaves are None until filled."""
    from typing import NamedTuple

    import jax

    from hfvo_tpu.utils import pack as pk

    class Feats(NamedTuple):
        uv: object
        desc: object
        depth: object
        valid: object

    rng = np.random.default_rng(0)
    tree = (
        jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)),
        Feats(
            uv=jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32)),
            desc=jnp.asarray(
                rng.integers(0, 2**32, size=(16, 8), dtype=np.uint64
                             ).astype(np.uint32)),
            depth=jnp.asarray(rng.normal(size=(16,)).astype(np.float32)),
            valid=jnp.asarray(rng.random(16) > 0.5),
        ),
        jnp.asarray(np.arange(7, dtype=np.int32)),
    )
    meta = pk.tree_spec_split(jax.eval_shape(lambda: tree))
    bm, bb = jax.jit(lambda: pk.pack_split(tree))()
    partial = pk.unpack_main(np.asarray(bm), meta)
    assert partial[1].uv is None and partial[1].desc is None
    np.testing.assert_array_equal(partial[1].depth, np.asarray(tree[1].depth))
    np.testing.assert_array_equal(partial[2], np.asarray(tree[2]))
    full = pk.fill_big(partial, pk.unpack_big_leaves(np.asarray(bb), meta), meta)
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_split_batch():
    from typing import NamedTuple

    import jax

    from hfvo_tpu.utils import pack as pk

    class F(NamedTuple):
        desc: object
        n: object

    rng = np.random.default_rng(1)
    def make(s):
        return F(desc=jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32) + s),
                 n=jnp.asarray(np.int32(s)))
    trees = [make(s) for s in range(3)]
    meta = pk.tree_spec_split(jax.eval_shape(lambda: trees[0]))
    bufs = [jax.jit(lambda t: pk.pack_split(t))(t) for t in trees]
    bm = np.stack([np.asarray(b[0]) for b in bufs])
    bb = np.stack([np.asarray(b[1]) for b in bufs])
    part = pk.unpack_main(bm, meta, batch=True)
    assert part.desc is None
    np.testing.assert_array_equal(part.n, np.arange(3, dtype=np.int32))
    big = pk.unpack_big_leaves(bb, meta, batch=True)
    full = pk.fill_big(part, big, meta)
    for s in range(3):
        np.testing.assert_array_equal(full.desc[s], np.asarray(trees[s].desc))
