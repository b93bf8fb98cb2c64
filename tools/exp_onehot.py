"""A/B: diffuse-cubemap sampling (fwd + VJP-to-texels) as XLA gathers vs
one-hot MXU matmuls. The diffuse map is tiny ([6,16,16,3], 1944 padded
texels), so the one-hot matrix A [chunk, T] is cheap to build and both
the forward (A @ flat) and the texel gradient (A^T @ g) ride the MXU —
no gathers, no scatters.

Run on TPU: python tools/exp_onehot.py [H W]
CPU check:  JAX_PLATFORMS=cpu python tools/exp_onehot.py 64 64
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from gi_gs_tpu.ops import cubemap as cm

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    R = 16

    rng = np.random.RandomState(0)
    cube = jnp.asarray(rng.rand(6, R, R, 3).astype(np.float32))
    dirs = rng.standard_normal((H, W, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)

    def sample_onehot(cubemap, d):
        """Seamless bilinear sample via one-hot matmul (same taps as
        cm.sample_cubemap seamless path)."""
        Rr = cubemap.shape[1]
        padded = cm.pad_cubemap(cubemap)          # [6, R+2, R+2, 3]
        E = Rr + 2
        T = 6 * E * E
        flat = padded.reshape(T, 3)
        face, fx, fy = cm.dir_to_face_uv(d)
        u = (fx + 1.0) * 0.5 * Rr - 0.5
        v = (fy + 1.0) * 0.5 * Rr - 0.5
        u0 = jnp.clip(jnp.floor(u), -1, Rr - 1)
        v0 = jnp.clip(jnp.floor(v), -1, Rr - 1)
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)
        base = face * E * E

        def tap(vv, uu):
            return base + (vv.astype(jnp.int32) + 1) * E + \
                uu.astype(jnp.int32) + 1

        idx = jnp.stack([tap(v0, u0), tap(v0, u0 + 1),
                         tap(v0 + 1, u0), tap(v0 + 1, u0 + 1)], -1)
        wts = jnp.stack([(1 - du) * (1 - dv), du * (1 - dv),
                         (1 - du) * dv, du * dv], -1)
        P = H * W
        idx = idx.reshape(P, 4)
        wts = wts.reshape(P, 4)

        CH = 8192
        pad = (-P) % CH
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        wts = jnp.pad(wts, ((0, pad), (0, 0)))
        iota = jnp.arange(T, dtype=jnp.int32)

        def chunk(c):
            i = jax.lax.dynamic_slice(idx, (c * CH, 0), (CH, 4))
            w_ = jax.lax.dynamic_slice(wts, (c * CH, 0), (CH, 4))
            A = ((i[:, :, None] == iota) * w_[:, :, None]).sum(1)  # [CH, T]
            return A @ flat                                         # [CH, 3]

        out = jax.lax.map(chunk, jnp.arange((P + pad) // CH))
        return out.reshape(-1, 3)[:P].reshape(H, W, 3)

    f_gather = jax.jit(lambda c, d: cm.sample_cubemap(c, d))
    f_onehot = jax.jit(sample_onehot)
    g_gather = jax.jit(jax.grad(lambda c: (cm.sample_cubemap(c, dirs) ** 2).sum()))
    g_onehot = jax.jit(jax.grad(lambda c: (sample_onehot(c, dirs) ** 2).sum()))

    a = f_gather(cube, dirs)
    b = f_onehot(cube, dirs)
    print("fwd max diff:", float(jnp.abs(a - b).max()))
    ga = g_gather(cube)
    gb = g_onehot(cube)
    print("bwd max diff:", float(jnp.abs(ga - gb).max()))

    def timeit(f, *args, n=10):
        f(*args)
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.time() - t0) / n * 1e3

    print(f"fwd  gather: {timeit(f_gather, cube, dirs):7.2f} ms   "
          f"onehot: {timeit(f_onehot, cube, dirs):7.2f} ms")
    print(f"fwd+bwd gather: {timeit(g_gather, cube):7.2f} ms   "
          f"onehot: {timeit(g_onehot, cube):7.2f} ms")


if __name__ == "__main__":
    main()
