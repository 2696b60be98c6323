"""Batch-1 (36, 36) solve variants on chip: LU vs Cholesky vs inv."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
import jax.scipy.linalg as jsl


def chain_ms(step, label, x0):
    def chain(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return step(c), None
            out, _ = lax.scan(body, x, None, length=n)
            return out
        float(run(x0))
        return run

    def total_ms(fn):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(x0))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo, hi = 8, 32
    t_hi = total_ms(chain(hi))
    if t_hi < 60.0:
        scale = int(60.0 / max(t_hi, 1e-3)) + 1
        lo, hi = lo * scale, hi * scale
    ms = max((total_ms(chain(hi)) - total_ms(chain(lo))) / (hi - lo), 1e-6)
    print(f"{label:40s} {ms:8.4f} ms", flush=True)
    return ms


rng = np.random.default_rng(0)
A = rng.normal(size=(36, 36)).astype(np.float32)
A = jnp.asarray(A @ A.T + 36 * np.eye(36, dtype=np.float32))
b = jnp.asarray(rng.normal(size=(36,)).astype(np.float32))
x0 = jnp.zeros((), jnp.float32)

chain_ms(lambda x: x + 1e-20 * jnp.linalg.solve(
    A + x * 1e-20, b).sum(), "jnp.linalg.solve (36,36)", x0)


def chol(x):
    a = A + x * 1e-20
    c = jnp.linalg.cholesky(a)
    y = jsl.solve_triangular(c, b, lower=True)
    s = jsl.solve_triangular(c.T, y, lower=False)
    return x + 1e-20 * s.sum()


chain_ms(chol, "cholesky + 2 triangular (36,36)", x0)

chain_ms(lambda x: x + 1e-20 * jsl.solve(
    A + x * 1e-20, b, assume_a="pos").sum(),
    "jsl.solve assume_a=pos", x0)


def cgsolve(x):
    a = A + x * 1e-20

    def mv(v):
        return a @ v

    s, _ = jax.scipy.sparse.linalg.cg(mv, b, maxiter=40, tol=1e-9)
    return x + 1e-20 * s.sum()


chain_ms(cgsolve, "scipy.sparse.cg 40 iters", x0)

# 30x30 (gauge-eliminated size)
A30 = A[:30, :30]
b30 = b[:30]
chain_ms(lambda x: x + 1e-20 * jnp.linalg.solve(
    A30 + x * 1e-20, b30).sum(), "jnp.linalg.solve (30,30)", x0)
