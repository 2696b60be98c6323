"""Micro-attribution: batched tiny-linalg variants on the chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sift_parallel_optimization_tpu.models.geometry import smallest_eigvec


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
    print(f"{label:44s} {ms:8.4f} ms", flush=True)
    return ms


rng = np.random.default_rng(0)
A12 = jnp.asarray(rng.normal(size=(128, 12, 12)).astype(np.float32))
A12 = jnp.einsum("bij,bkj->bik", A12, A12) + 0.1 * jnp.eye(12)
A4 = jnp.asarray(rng.normal(size=(256, 4, 4)).astype(np.float32))
A4 = jnp.einsum("bij,bkj->bik", A4, A4) + 0.1 * jnp.eye(4)
A6 = jnp.asarray(rng.normal(size=(128, 6, 6)).astype(np.float32))
A6 = jnp.einsum("bij,bkj->bik", A6, A6) + 0.1 * jnp.eye(6)
b12 = jnp.asarray(rng.normal(size=(128, 12)).astype(np.float32))

x0 = jnp.zeros((), jnp.float32)

chain_ms(lambda x: x + 1e-20 * smallest_eigvec(A12 + x * 1e-20).sum(),
         "smallest_eigvec 128x(12x12) [3 solves]", x0)
chain_ms(lambda x: x + 1e-20 * jnp.linalg.solve(
    A12 + x * 1e-20, b12[..., None])[..., 0].sum(),
         "jnp.linalg.solve 128x(12x12) x1", x0)


def lu_once_3iters(x):
    import jax.scipy.linalg as jsl
    a = A12 + x * 1e-20
    lu, piv = jax.vmap(jsl.lu_factor)(a)
    v = jnp.broadcast_to(jnp.sin(jnp.arange(1, 13, dtype=jnp.float32)),
                         (128, 12))
    for _ in range(3):
        v = jax.vmap(jsl.lu_solve)((lu, piv), v)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return x + 1e-20 * v.sum()


chain_ms(lu_once_3iters, "lu_factor once + 3 lu_solve 128x(12x12)", x0)


def inv_then_3mv(x):
    a = A12 + x * 1e-20
    inv = jnp.linalg.inv(a)
    v = jnp.broadcast_to(jnp.sin(jnp.arange(1, 13, dtype=jnp.float32)),
                         (128, 12))
    for _ in range(3):
        v = jnp.einsum("bij,bj->bi", inv, v)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return x + 1e-20 * v.sum()


chain_ms(inv_then_3mv, "inv once + 3 matvec 128x(12x12)", x0)

chain_ms(lambda x: x + 1e-20 * smallest_eigvec(A4 + x * 1e-20).sum(),
         "smallest_eigvec 256x(4x4) [3 solves]", x0)


def adj4_inv(a):
    """Closed-form 4x4 inverse via cofactors (batched elementwise)."""
    m = a
    # Minors via 2x2 complements (standard 4x4 inverse expansion).
    s0 = m[..., 0, 0] * m[..., 1, 1] - m[..., 1, 0] * m[..., 0, 1]
    s1 = m[..., 0, 0] * m[..., 1, 2] - m[..., 1, 0] * m[..., 0, 2]
    s2 = m[..., 0, 0] * m[..., 1, 3] - m[..., 1, 0] * m[..., 0, 3]
    s3 = m[..., 0, 1] * m[..., 1, 2] - m[..., 1, 1] * m[..., 0, 2]
    s4 = m[..., 0, 1] * m[..., 1, 3] - m[..., 1, 1] * m[..., 0, 3]
    s5 = m[..., 0, 2] * m[..., 1, 3] - m[..., 1, 2] * m[..., 0, 3]
    c5 = m[..., 2, 2] * m[..., 3, 3] - m[..., 3, 2] * m[..., 2, 3]
    c4 = m[..., 2, 1] * m[..., 3, 3] - m[..., 3, 1] * m[..., 2, 3]
    c3 = m[..., 2, 1] * m[..., 3, 2] - m[..., 3, 1] * m[..., 2, 2]
    c2 = m[..., 2, 0] * m[..., 3, 3] - m[..., 3, 0] * m[..., 2, 3]
    c1 = m[..., 2, 0] * m[..., 3, 2] - m[..., 3, 0] * m[..., 2, 2]
    c0 = m[..., 2, 0] * m[..., 3, 1] - m[..., 3, 0] * m[..., 2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    inv = jnp.stack([
        jnp.stack([
            m[..., 1, 1] * c5 - m[..., 1, 2] * c4 + m[..., 1, 3] * c3,
            -m[..., 0, 1] * c5 + m[..., 0, 2] * c4 - m[..., 0, 3] * c3,
            m[..., 3, 1] * s5 - m[..., 3, 2] * s4 + m[..., 3, 3] * s3,
            -m[..., 2, 1] * s5 + m[..., 2, 2] * s4 - m[..., 2, 3] * s3,
        ], -1),
        jnp.stack([
            -m[..., 1, 0] * c5 + m[..., 1, 2] * c2 - m[..., 1, 3] * c1,
            m[..., 0, 0] * c5 - m[..., 0, 2] * c2 + m[..., 0, 3] * c1,
            -m[..., 3, 0] * s5 + m[..., 3, 2] * s2 - m[..., 3, 3] * s1,
            m[..., 2, 0] * s5 - m[..., 2, 2] * s2 + m[..., 2, 3] * s1,
        ], -1),
        jnp.stack([
            m[..., 1, 0] * c4 - m[..., 1, 1] * c2 + m[..., 1, 3] * c0,
            -m[..., 0, 0] * c4 + m[..., 0, 1] * c2 - m[..., 0, 3] * c0,
            m[..., 3, 0] * s4 - m[..., 3, 1] * s2 + m[..., 3, 3] * s0,
            -m[..., 2, 0] * s4 + m[..., 2, 1] * s2 - m[..., 2, 3] * s0,
        ], -1),
        jnp.stack([
            -m[..., 1, 0] * c3 + m[..., 1, 1] * c1 - m[..., 1, 2] * c0,
            m[..., 0, 0] * c3 - m[..., 0, 1] * c1 + m[..., 0, 2] * c0,
            -m[..., 3, 0] * s3 + m[..., 3, 1] * s1 - m[..., 3, 2] * s0,
            m[..., 2, 0] * s3 - m[..., 2, 1] * s1 + m[..., 2, 2] * s0,
        ], -1),
    ], -2)
    return inv / det[..., None, None]


def adj4_3mv(x):
    a = A4 + x * 1e-20
    inv = adj4_inv(a)
    v = jnp.broadcast_to(jnp.sin(jnp.arange(1, 5, dtype=jnp.float32)),
                         (256, 4))
    for _ in range(3):
        v = jnp.einsum("bij,bj->bi", inv, v)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return x + 1e-20 * v.sum()


chain_ms(adj4_3mv, "adjugate inv + 3 matvec 256x(4x4)", x0)

# sanity: adj4 inverse correctness
inv = np.asarray(adj4_inv(A4))
err = np.abs(np.einsum("bij,bjk->bik", inv, np.asarray(A4)) - np.eye(4)).max()
print("adj4 inverse max err:", err)

chain_ms(lambda x: x + 1e-20 * jnp.linalg.solve(
    A6 + x * 1e-20, b12[..., :6, None])[..., 0].sum(),
         "jnp.linalg.solve 128x(6x6) x1", x0)
