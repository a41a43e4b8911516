"""TPU micro-bench: Pallas fused den fwd-bwd vs XLA scan path, real sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    from tdnnf_nas_tpu.ops.fwdbwd import forward_score
    from tdnnf_nas_tpu.ops.pallas_fwdbwd import pallas_forward_score

    rng = np.random.RandomState(0)
    b, t, s, p = 64, 50, 2208, 6034
    trans = rng.rand(s, s).astype(np.float32)
    trans *= rng.rand(s, s) < 0.05
    trans[np.arange(s), np.arange(s)] += 0.3
    trans /= trans.sum(1, keepdims=True)
    state_pdf = rng.randint(0, p, s).astype(np.int32)
    init = (rng.rand(s) / s).astype(np.float32)
    init /= init.sum()
    final = np.ones(s, np.float32)
    obs = jnp.asarray(rng.randn(b, t, p).astype(np.float32))
    args = tuple(map(jnp.asarray, (trans, state_pdf, init, final)))

    # correctness on-device
    z_x = np.asarray(forward_score(obs, *args, leaky_coef=0.1))
    z_p = np.asarray(jax.jit(lambda o: pallas_forward_score(o, *args, leaky_coef=0.1))(obs))
    err = np.max(np.abs(z_x - z_p) / np.maximum(np.abs(z_x), 1.0))
    print(f"fwd rel err: {err:.2e}")

    g_x = jax.jit(jax.grad(lambda o: jnp.sum(forward_score(o, *args, leaky_coef=0.1))))
    g_p = jax.jit(jax.grad(lambda o: jnp.sum(pallas_forward_score(o, *args, leaky_coef=0.1))))
    gx = np.asarray(g_x(obs)); gp = np.asarray(g_p(obs))
    print(f"grad max abs err: {np.max(np.abs(gx - gp)):.2e}")

    f_x = jax.jit(lambda o: forward_score(o, *args, leaky_coef=0.1))
    f_p = jax.jit(lambda o: pallas_forward_score(o, *args, leaky_coef=0.1))
    print(f"XLA    fwd:      {timeit(f_x, obs):7.2f} ms")
    print(f"Pallas fwd:      {timeit(f_p, obs):7.2f} ms")
    print(f"XLA    fwd+grad: {timeit(g_x, obs):7.2f} ms")
    print(f"Pallas fwd+grad: {timeit(g_p, obs):7.2f} ms")


if __name__ == "__main__":
    main()
