"""Worker process for the 2-process jax.distributed BA test.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Each process exposes 4 virtual CPU devices; together they form one global
8-device mesh. Prints MULTIHOST_OK on success (asserts otherwise)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hfvo_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hfvo_tpu.config import tum3_config  # noqa: E402
from hfvo_tpu.geometry import se3  # noqa: E402
from hfvo_tpu.parallel.dist_ba import (  # noqa: E402
    dist_local_bundle_adjustment,
    shard_ba_problem,
)
from hfvo_tpu.parallel.mesh import make_mesh  # noqa: E402
from hfvo_tpu.testing.ba_fixture import synthetic_ba_problem  # noqa: E402

ndev = len(jax.devices())
assert ndev == 4 * nproc, f"expected {4 * nproc} global devices, got {ndev}"
assert len(jax.local_devices()) == 4

intr = tum3_config().camera
mesh = make_mesh(n_edge=ndev, n_seq=1)
prob, T_gt = synthetic_ba_problem(intr, ndev)
sp = shard_ba_problem(prob, ndev)
assert sp.n_dropped == 0
sp = multihost.globalize_sharded_ba(sp, mesh)

kf_T, pt_X, e_inl, le_inl = dist_local_bundle_adjustment(mesh, sp, intr)
# kf_T is replicated -> addressable on every process; the landmark table
# stays sharded (only local blocks addressable), so check local shards.
kf_T = np.asarray(jax.block_until_ready(kf_T))
err = np.abs(
    np.asarray(
        se3.log_se3(jnp.asarray(T_gt.astype(np.float32)) @ se3.inv(jnp.asarray(kf_T)))
    )
).max()
assert np.isfinite(kf_T).all()
assert err < 1e-5, f"multi-host BA failed to converge: {err}"
for shard in pt_X.addressable_shards:
    assert np.isfinite(np.asarray(shard.data)).all()

print(f"MULTIHOST_OK proc={pid} ndev={ndev} twist_err={err:.2e}", flush=True)
