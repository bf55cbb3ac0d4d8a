"""Micro-bench of dense_flow_half variants (dev tool)."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from hfvo_tpu.ops import lk
from hfvo_tpu.testing import synthetic


def timeit(name, fn, *args, n=40):
    out = fn(*args)
    jax.block_until_ready(out)
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        meds.append((time.perf_counter() - t0) / n)
    print(f"{name:40s} {float(np.median(meds))*1e3:8.3f} ms")


def main():
    T_wc, grays, depths = synthetic.render_sequence(n=2, seed=0)
    i0 = jnp.asarray(grays[0].astype(np.float32))
    i1 = jnp.asarray(grays[1].astype(np.float32))

    for s, b in [(12, 11), (8, 9)]:
        f = jax.jit(partial(lk.dense_flow_half, search=s, box=b))
        timeit(f"dense_flow_half s={s} b={b}", f, i0, i1)

    # bf16 cost volume + boxfilt variant
    def flow_bf16(img0, img1, search=12, box=11):
        a = lk._avg_pool2(img0).astype(jnp.bfloat16)
        b = lk._avg_pool2(img1).astype(jnp.bfloat16)
        h, w = a.shape
        pad = jnp.pad(b, search, mode="edge")
        k = box
        tau = 2.0 * float(k * k)
        dxs = jnp.arange(-search, search + 1, dtype=jnp.float32)
        r2 = k // 2
        iy = jnp.arange(h)
        Bh = (jnp.abs(iy[:, None] - iy[None, :]) <= r2).astype(jnp.bfloat16)
        ix = jnp.arange(w)
        Bw = (jnp.abs(ix[:, None] - ix[None, :]) <= r2).astype(jnp.bfloat16)

        def boxfilt(C):
            C = jnp.einsum("hj,djw->dhw", Bh, C,
                           preferred_element_type=jnp.float32)
            return jnp.einsum("dhw,wx->dhx", C.astype(jnp.bfloat16), Bw,
                              preferred_element_type=jnp.float32)

        def dy_step(carry, dy):
            M, S0, Sx, Sy = carry
            band = jax.lax.dynamic_slice(
                pad, (search + dy, 0), (h, w + 2 * search))
            C = jnp.stack([
                jnp.abs(a - jax.lax.dynamic_slice(band, (0, search + dx), (h, w)))
                for dx in range(-search, search + 1)
            ])
            C = boxfilt(C)
            m = jnp.min(C, axis=0)
            M_new = jnp.minimum(M, m)
            scale = jnp.exp((M_new - M) / tau)
            Wt = jnp.exp(-(C - M_new[None]) / tau)
            S0 = S0 * scale + jnp.sum(Wt, axis=0)
            Sx = Sx * scale + jnp.einsum("dhw,d->hw", Wt, dxs)
            Sy = Sy * scale + jnp.sum(Wt, axis=0) * dy.astype(jnp.float32)
            return (M_new, S0, Sx, Sy), None

        init = (jnp.full((h, w), 1e30), jnp.zeros((h, w)),
                jnp.zeros((h, w)), jnp.zeros((h, w)))
        (M, S0, Sx, Sy), _ = jax.lax.scan(
            dy_step, init, jnp.arange(-search, search + 1))
        fx = Sx / (S0 + 1e-12)
        fy = Sy / (S0 + 1e-12)
        flow = jnp.stack([fx, fy], axis=-1) * 2.0
        conf = M / float(k * k)
        return flow, conf

    for s, b in [(12, 11), (8, 9)]:
        f = jax.jit(partial(flow_bf16, search=s, box=b))
        timeit(f"flow_bf16 s={s} b={b}", f, i0, i1)
        # accuracy vs f32
        fl_ref, c_ref = jax.jit(partial(lk.dense_flow_half, search=s, box=b))(i0, i1)
        fl, c = f(i0, i1)
        err = np.abs(np.asarray(fl) - np.asarray(fl_ref))
        print(f"   max|df|={err.max():.3f} px  mean={err.mean():.4f}")


if __name__ == "__main__":
    main()
