"""Pack a pytree of device arrays into ONE flat uint32 buffer.

Over an RTT-bound transport every `device_get` array is its own transfer:
pulling the fused per-frame result's ~44 leaves costs ~44 round trips
(~75 ms measured) while the actual payload is ~170 KB (~3 ms). Grouping
by dtype still left 4 buffers = 4 round trips (~96 ms per batch step once
device compute stopped dominating); bitcasting every leaf into one uint32
container makes the pull a single transfer.

f32/s32/u32 leaves bitcast for free; bool/u8/u16 leaves widen to uint32
(size inflation is irrelevant next to one ~25 ms round trip). `unpack`
rebuilds the original tree from the host buffer using a static spec
captured with `jax.eval_shape`.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tree_spec(tree) -> Tuple[Any, list]:
    """Static (treedef, [(dtype_str, shape), ...]) for `unpack`. Call on
    `jax.eval_shape(...)` output (ShapeDtypeStructs work)."""
    leaves, treedef = jax.tree.flatten(tree)
    spec = [(np.dtype(l.dtype).str, tuple(l.shape)) for l in leaves]
    return treedef, spec


def _to_u32(x: jnp.ndarray) -> jnp.ndarray:
    x = x.reshape(-1)
    if x.dtype == jnp.uint32:
        return x
    if x.dtype in (jnp.float32, jnp.int32):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)
    if x.dtype in (jnp.bool_, jnp.uint8, jnp.uint16, jnp.int8, jnp.int16):
        return x.astype(jnp.uint32)
    raise TypeError(f"pack: unsupported leaf dtype {x.dtype}")


def pack(tree) -> jnp.ndarray:
    """Inside jit: flatten + bitcast/widen every leaf into one 1-D uint32
    buffer. Leaf order follows tree flattening order."""
    leaves, _ = jax.tree.flatten(tree)
    return jnp.concatenate([_to_u32(l) for l in leaves])


def unpack(buf_host: np.ndarray, meta, batch: bool = False):
    """Rebuild the tree from the pulled host buffer. With `batch`, the
    buffer has a leading batch axis (vmapped program) and the rebuilt
    leaves keep it."""
    treedef, spec = meta
    buf = np.asarray(buf_host)
    pos = 0
    leaves = []
    for dt, shape in spec:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        seg = buf[:, pos : pos + n] if batch else buf[pos : pos + n]
        pos += n
        d = np.dtype(dt)
        if d == np.uint32:
            arr = seg
        elif d in (np.dtype(np.float32), np.dtype(np.int32)):
            arr = seg.view(d) if seg.flags.c_contiguous else np.ascontiguousarray(seg).view(d)
        elif d == np.dtype(np.bool_):
            arr = seg != 0
        else:  # u8/u16/i8/i16 widened on device
            arr = seg.astype(d)
        arr = arr.reshape((buf.shape[0],) + shape if batch else shape)
        leaves.append(arr)
    return jax.tree.unflatten(treedef, leaves)
