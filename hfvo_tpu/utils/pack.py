"""Pack a pytree of device arrays into ONE flat uint8 buffer.

Over an RTT-bound transport every `device_get` array is its own transfer:
pulling the fused per-frame result's ~44 leaves costs ~44 round trips
(~75 ms measured) while the actual payload is ~170 KB (~3 ms). Grouping
by dtype still left 4 buffers = 4 round trips; packing every leaf into one
container makes the pull a single transfer.

The container is uint8 with TIGHT per-leaf encoding — on a
bandwidth-bound transport (36 MB/s tunnel measured) the width of the
buffer matters as much as the transfer count:
- f32/i32/u32 leaves bitcast to 4 bytes/elem (free),
- u16/i16 to 2 bytes/elem, u8/i8 stay 1 byte/elem,
- bool leaves bitpack 8/byte (a widened bool costs 32x its information).
Each leaf is padded to a 4-byte boundary so host-side `.view(dtype)`
decodes stay aligned. `unpack` rebuilds the original tree from the host
buffer using a static spec captured with `jax.eval_shape`.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_4B = (np.dtype(np.float32), np.dtype(np.int32), np.dtype(np.uint32))
_2B = (np.dtype(np.uint16), np.dtype(np.int16), np.dtype(np.float16))
_1B = (np.dtype(np.uint8), np.dtype(np.int8))


def _leaf_nbytes(d: np.dtype, n: int) -> int:
    """Padded byte length of one packed leaf (4-byte aligned)."""
    if d == np.dtype(np.bool_):
        raw = (n + 7) // 8
    else:
        raw = n * d.itemsize
    return (raw + 3) // 4 * 4


def tree_spec(tree) -> Tuple[Any, list]:
    """Static (treedef, [(dtype_str, shape), ...]) for `unpack`. Call on
    `jax.eval_shape(...)` output (ShapeDtypeStructs work)."""
    leaves, treedef = jax.tree.flatten(tree)
    spec = [(np.dtype(l.dtype).str, tuple(l.shape)) for l in leaves]
    return treedef, spec


def _to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Encode one leaf as a flat uint8 run, padded to 4 bytes."""
    x = x.reshape(-1)
    n = x.shape[0]
    d = np.dtype(x.dtype)
    if d == np.dtype(np.bool_):
        npad = (-n) % 8
        bits = jnp.pad(x, (0, npad)).reshape(-1, 8)
        weights = (1 << jnp.arange(8, dtype=jnp.uint32))
        out = (bits.astype(jnp.uint32) * weights).sum(-1).astype(jnp.uint8)
    elif d in _4B:
        out = jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)
    elif d in _2B:
        out = jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)
    elif d in _1B:
        out = jax.lax.bitcast_convert_type(x, jnp.uint8)
    else:
        raise TypeError(f"pack: unsupported leaf dtype {d}")
    pad = _leaf_nbytes(d, n) - out.shape[0]
    if pad:
        out = jnp.pad(out, (0, pad))
    return out


def pack(tree) -> jnp.ndarray:
    """Inside jit: flatten + tightly encode every leaf into one 1-D uint8
    buffer. Leaf order follows tree flattening order."""
    leaves, _ = jax.tree.flatten(tree)
    return jnp.concatenate([_to_u8(l) for l in leaves])


def packed_nbytes(meta) -> int:
    """Total packed byte length for a spec from `tree_spec`."""
    _, spec = meta
    return sum(
        _leaf_nbytes(np.dtype(dt), int(np.prod(shape, dtype=np.int64)) if shape else 1)
        for dt, shape in spec
    )


def unpack(buf_host: np.ndarray, meta, batch: bool = False):
    """Rebuild the tree from the pulled host buffer. With `batch`, the
    buffer has a leading batch axis (vmapped program) and the rebuilt
    leaves keep it."""
    treedef, spec = meta
    buf = np.ascontiguousarray(np.asarray(buf_host))
    pos = 0
    leaves = []
    for dt, shape in spec:
        d = np.dtype(dt)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        nb = _leaf_nbytes(d, n)
        seg = buf[:, pos : pos + nb] if batch else buf[pos : pos + nb]
        pos += nb
        if d == np.dtype(np.bool_):
            bits = np.unpackbits(
                np.ascontiguousarray(
                    seg[:, : (n + 7) // 8] if batch else seg[: (n + 7) // 8]
                ),
                axis=-1, bitorder="little",
            )
            arr = (bits[:, :n] if batch else bits[:n]) != 0
        else:
            raw = n * d.itemsize
            arr = np.ascontiguousarray(
                seg[:, :raw] if batch else seg[:raw]
            ).view(d)
        arr = arr.reshape((buf.shape[0],) + shape if batch else shape)
        leaves.append(arr)
    return jax.tree.unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Split packing: per-frame essentials vs lazily-pulled (keyframe-only) leaves
# ---------------------------------------------------------------------------

# Leaf names (NamedTuple field keys) whose contents the host only consumes
# on keyframe / relocalization / viz paths — ~70% of the fused result's
# wire bytes. They pack into a SECOND buffer that is pulled on demand
# (~1/7 frames) instead of riding every frame's transfer.
BIG_LEAF_NAMES = frozenset(
    {"desc", "uv", "obs", "angle", "octave", "inv_sigma2"}
)


def _leaf_is_big(path) -> bool:
    for k in path:
        name = getattr(k, "name", None)
        if name in BIG_LEAF_NAMES:
            return True
    return False


def tree_spec_split(tree):
    """(treedef, [(dtype, shape)], big_mask) — like tree_spec plus a
    per-leaf 'keyframe-only' flag derived from the leaf's field name."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    spec = [
        (np.dtype(l.dtype).str, tuple(l.shape)) for _, l in paths_leaves
    ]
    big = [_leaf_is_big(p) for p, _ in paths_leaves]
    return treedef, spec, big


def pack_split(tree) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside jit: (buf_main, buf_big) uint8 buffers; leaf membership by
    `tree_spec_split`'s mask (field-name based, so it matches the spec
    computed from eval_shape of the same tree structure)."""
    paths_leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    main = [_to_u8(l) for p, l in paths_leaves if not _leaf_is_big(p)]
    big = [_to_u8(l) for p, l in paths_leaves if _leaf_is_big(p)]
    one = jnp.zeros((4,), jnp.uint8)  # never-empty: stable signatures
    return (
        jnp.concatenate(main) if main else one,
        jnp.concatenate(big) if big else one,
    )


def _decode_leaves(buf, spec_subset, batch):
    pos = 0
    leaves = []
    for dt, shape in spec_subset:
        d = np.dtype(dt)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        nb = _leaf_nbytes(d, n)
        seg = buf[:, pos : pos + nb] if batch else buf[pos : pos + nb]
        pos += nb
        if d == np.dtype(np.bool_):
            bits = np.unpackbits(
                np.ascontiguousarray(
                    seg[:, : (n + 7) // 8] if batch else seg[: (n + 7) // 8]
                ),
                axis=-1, bitorder="little",
            )
            arr = (bits[:, :n] if batch else bits[:n]) != 0
        else:
            raw = n * d.itemsize
            arr = np.ascontiguousarray(
                seg[:, :raw] if batch else seg[:raw]
            ).view(d)
        arr = arr.reshape(
            (buf.shape[0],) + shape if batch else shape
        )
        leaves.append(arr)
    return leaves


def unpack_main(buf_host: np.ndarray, meta, batch: bool = False):
    """Rebuild the tree from the MAIN buffer only; keyframe-only leaves
    come back as None (any accidental per-frame use fails loudly)."""
    treedef, spec, big = meta
    buf = np.ascontiguousarray(np.asarray(buf_host))
    main_leaves = _decode_leaves(
        buf, [s for s, b in zip(spec, big) if not b], batch
    )
    it = iter(main_leaves)
    leaves = [None if b else next(it) for b in big]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def unpack_big_leaves(buf_host: np.ndarray, meta, batch: bool = False):
    """Decode ONLY the keyframe-only leaves (flatten order) from the big
    buffer -> list of arrays (pair with `fill_big`)."""
    _, spec, big = meta
    buf = np.ascontiguousarray(np.asarray(buf_host))
    return _decode_leaves(buf, [s for s, b in zip(spec, big) if b], batch)


def fill_big(tree, big_leaves, meta):
    """Return `tree` with its None keyframe-only leaves replaced by
    `big_leaves` (from unpack_big_leaves).

    Flattening follows the meta's OWN treedef (`flatten_up_to`), never an
    is-leaf-None predicate: configs with feature families disabled carry
    None SUBTREES (line_out/plane_out/manh_out), which a None-as-leaf
    flatten would count as leaves and silently misalign every leaf after
    them."""
    treedef, _, big = meta
    flat = treedef.flatten_up_to(tree)
    it = iter(big_leaves)
    leaves = [next(it) if b else l for l, b in zip(flat, big)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
