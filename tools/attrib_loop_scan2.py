"""Focused in-scan attribution of propose_archive_loop pieces."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sift_parallel_optimization_tpu.models.frontend import (
    extract_features,
    sift_config,
)
from sift_parallel_optimization_tpu.models.matching import match_descriptors
from sift_parallel_optimization_tpu.models.odometry import (
    empty_archive,
    propose_archive_loop,
)
from sift_parallel_optimization_tpu.models.sfm import ransac_pnp
from sift_parallel_optimization_tpu.utils import native

size, W, B = 256, 6, 128
focal = float(size)
cfg = sift_config(size)
K = jnp.array(
    [[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]], jnp.float32
)
fe = jax.jit(lambda x: extract_features(x, cfg, B * 2, dual_orientation=True))
feats = fe(jnp.asarray(native.render_frame(
    size, np.zeros(3, np.float32), np.zeros(3, np.float32), focal, seed=2)))
A = 64 * B
rng = np.random.default_rng(1)
d = rng.normal(size=(A, 128)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
arch0 = empty_archive(A)._replace(
    positions=jnp.asarray(rng.normal(size=(A, 3)).astype(np.float32) + [0, 0, 5]),
    desc=jnp.asarray(d),
    birth=jnp.zeros(A, jnp.int32),
    valid=jnp.ones(A, bool),
)
key = jax.random.key(0)
uv = jnp.stack([feats.keypoints.x, feats.keypoints.y], -1)
fi = jnp.asarray(W + 1, jnp.int32)


def chain_ms(body, label, carry0):
    def chain(n):
        @jax.jit
        def run(c):
            out, _ = lax.scan(body, c, None, length=n)
            return jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda v: v.sum().astype(jnp.float32), out),
            )
        float(run(carry0)); return run

    def tot(f):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); float(f(carry0))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    lo, hi = 8, 32
    t = tot(chain(hi))
    if t < 60:
        s = int(60 / max(t, 1e-3)) + 1
        lo, hi = lo * s, hi * s
    print(f"{label:44s} {(tot(chain(hi)) - tot(chain(lo))) / (hi - lo):8.4f}"
          " ms", flush=True)


# Carry the archive and MUTATE a cell each iteration so nothing hoists.
def b_propose(carry, _):
    arch, acc = carry
    arch = arch._replace(
        positions=arch.positions.at[0, 0].add(1e-20)
    )
    prop = propose_archive_loop(key, feats, arch, fi, K, min_gap=W + 1)
    return (arch, acc + 1e-20 * (prop.rvec.sum() + prop.n_inliers)), None


def b_match(carry, _):
    arch, acc = carry
    arch = arch._replace(positions=arch.positions.at[0, 0].add(1e-20),
                         desc=arch.desc.at[0, 0].add(1e-20))
    m = match_descriptors(feats.descriptors, arch.desc,
                          feats.keypoints.valid, arch.valid)
    return (arch, acc + 1e-20 * (m.similarity.sum() + m.idx2.sum())), None


def b_pnp(carry, _):
    arch, acc = carry
    arch = arch._replace(positions=arch.positions.at[0, 0].add(1e-20))
    idx2 = jnp.arange(uv.shape[0]) % A
    pts3d = arch.positions[idx2]
    cam, inl, n = ransac_pnp(key, pts3d, uv,
                             jnp.ones(uv.shape[0], bool), K)
    return (arch, acc + 1e-20 * (cam.rvec.sum() + n)), None


c0 = (arch0, jnp.zeros(()))
chain_ms(b_propose, "propose in scan (carried arch)", c0)
chain_ms(b_match, "match 256x8192 in scan (carried desc)", c0)
chain_ms(b_pnp, "ransac_pnp in scan (carried positions)", c0)


# Replicate propose_archive_loop piecewise to find the hidden 1.3 ms.
from sift_parallel_optimization_tpu.models.sfm import ransac_pnp as _rp


def make_b(stop):
    def b(carry, _):
        arch, acc = carry
        arch = arch._replace(positions=arch.positions.at[0, 0].add(1e-20))
        old = arch.valid & (arch.birth <= fi - (W + 1))
        m = match_descriptors(feats.descriptors, arch.desc,
                              feats.keypoints.valid, old)
        acc = acc + 1e-20 * m.similarity.sum()
        if stop == "match":
            return (arch, acc), None
        pts3d = arch.positions[m.idx2]
        mask = m.valid & old[m.idx2]
        acc = acc + 1e-20 * (pts3d.sum() + mask.sum())
        if stop == "gather":
            return (arch, acc), None
        cam, inl, n = _rp(key, pts3d, uv, mask, K, threshold=3.0)
        acc = acc + 1e-20 * (cam.rvec.sum() + n)
        if stop == "pnp":
            return (arch, acc), None
        births = arch.birth[m.idx2]
        keep = inl & mask
        cnt = jnp.maximum(keep.sum(), 1)
        b_sorted = jnp.sort(jnp.where(keep, births, jnp.int32(2**30)))
        birth = b_sorted[jnp.clip((cnt - 1) // 2, 0, births.shape[0] - 1)]
        birth = jnp.where(keep.any(), birth, 0)
        acc = acc + 1e-20 * birth
        return (arch, acc), None
    return b


chain_ms(make_b("match"), "replica: match+old mask", c0)
chain_ms(make_b("gather"), "replica: + gathers", c0)
chain_ms(make_b("pnp"), "replica: + ransac_pnp", c0)
chain_ms(make_b("all"), "replica: + median (full)", c0)


# Isolate: gather 256 rows from the carried (8192, 3) by various index
# sources.
m0 = jax.jit(lambda: match_descriptors(
    feats.descriptors, arch0.desc, feats.keypoints.valid, arch0.valid))()
idx_const = m0.idx2          # device constant (256,)
idx_np = jnp.asarray(np.asarray(m0.idx2))


def g_const(carry, _):
    arch, acc = carry
    arch = arch._replace(positions=arch.positions.at[0, 0].add(1e-20))
    pts3d = arch.positions[idx_np]
    return (arch, acc + 1e-20 * pts3d.sum()), None


def g_live_match(carry, _):
    arch, acc = carry
    arch = arch._replace(positions=arch.positions.at[0, 0].add(1e-20),
                         desc=arch.desc.at[0, 0].add(1e-20))
    m = match_descriptors(feats.descriptors, arch.desc,
                          feats.keypoints.valid, arch.valid)
    pts3d = arch.positions[m.idx2]
    return (arch, acc + 1e-20 * (pts3d.sum() + m.similarity.sum())), None


def g_valid_only(carry, _):
    arch, acc = carry
    arch = arch._replace(positions=arch.positions.at[0, 0].add(1e-20),
                         desc=arch.desc.at[0, 0].add(1e-20))
    m = match_descriptors(feats.descriptors, arch.desc,
                          feats.keypoints.valid, arch.valid)
    return (arch, acc + 1e-20 * (m.valid.sum() + m.similarity.sum())), None


chain_ms(g_const, "gather via constant idx", c0)
chain_ms(g_live_match, "match(live desc) + gather", c0)
chain_ms(g_valid_only, "match(live desc) + valid (mutual-NN)", c0)


# Candidate fix: mutual-NN via plain max + min-index reductions instead
# of the variadic argmax (axis 0).
def match_fast(desc1, desc2, valid1, valid2, ratio=0.8):
    sim = jnp.einsum("id,jd->ij", desc1, desc2,
                     preferred_element_type=jnp.float32)
    sim = jnp.where(valid2[None, :], sim, -jnp.inf)
    top2, top2_idx = lax.top_k(sim, 2)
    s1, s2 = top2[:, 0], top2[:, 1]
    best = top2_idx[:, 0]
    ratio_ok = (2.0 - 2.0 * s1) < (ratio * ratio) * (2.0 - 2.0 * s2)
    ok = valid1 & ratio_ok & jnp.isfinite(s1)
    simm = jnp.where(valid1[:, None], sim, -jnp.inf)
    col_max = jnp.max(simm, axis=0)
    k1 = desc1.shape[0]
    rows = jnp.arange(k1, dtype=jnp.int32)[:, None]
    first = jnp.min(jnp.where(simm == col_max[None, :], rows, k1), axis=0)
    ok = ok & (first[best] == jnp.arange(k1))
    return ok, best, s1


def g_valid_fast(carry, _):
    arch, acc = carry
    arch = arch._replace(positions=arch.positions.at[0, 0].add(1e-20),
                         desc=arch.desc.at[0, 0].add(1e-20))
    ok, best, s1 = match_fast(feats.descriptors, arch.desc,
                              feats.keypoints.valid, arch.valid)
    return (arch, acc + 1e-20 * (ok.sum() + s1.sum())), None


chain_ms(g_valid_fast, "match fast-mutual (max+min-index)", c0)

# Equivalence vs the argmax form on real data.
m_ref = jax.jit(lambda d: match_descriptors(
    feats.descriptors, d, feats.keypoints.valid, arch0.valid))(arch0.desc)
ok_f, best_f, s1_f = jax.jit(lambda d: match_fast(
    feats.descriptors, d, feats.keypoints.valid, arch0.valid))(arch0.desc)
print("valid equal:", bool(jnp.all(m_ref.valid == ok_f)),
      "idx equal:", bool(jnp.all(m_ref.idx2 == best_f)))


# Bare reduction probes on a carried (256, 8192) array.
S0 = jnp.asarray(rng.normal(size=(256, 8192)).astype(np.float32))
cS = (S0, jnp.zeros(()))


def r_ax0(carry, _):
    s, acc = carry
    s = s.at[0, 0].add(1e-20)
    return (s, acc + 1e-20 * jnp.max(s, axis=0).sum()), None


def r_ax1(carry, _):
    s, acc = carry
    s = s.at[0, 0].add(1e-20)
    return (s, acc + 1e-20 * jnp.max(s, axis=1).sum()), None


def r_argmax0(carry, _):
    s, acc = carry
    s = s.at[0, 0].add(1e-20)
    return (s, acc + 1e-20 * jnp.argmax(s, axis=0).sum()), None


def r_both(carry, _):
    s, acc = carry
    s = s.at[0, 0].add(1e-20)
    t2, _i = lax.top_k(s, 2)
    return (s, acc + 1e-20 * (jnp.max(s, axis=0).sum() + t2.sum())), None


chain_ms(r_ax0, "bare max axis=0 (256,8192)", cS)
chain_ms(r_ax1, "bare max axis=1 (256,8192)", cS)
chain_ms(r_argmax0, "bare argmax axis=0 (256,8192)", cS)
chain_ms(r_both, "top_k(axis1) + max(axis0) together", cS)


# Build match_fast incrementally from the bare probes.
D1 = feats.descriptors
V1 = feats.keypoints.valid


def mk(stage):
    def b(carry, _):
        arch, acc = carry
        arch = arch._replace(desc=arch.desc.at[0, 0].add(1e-20))
        sim = jnp.einsum("id,jd->ij", D1, arch.desc,
                         preferred_element_type=jnp.float32)
        sim = jnp.where(arch.valid[None, :], sim, -jnp.inf)
        if stage == "mm":
            return (arch, acc + 1e-20 * sim.sum()), None
        t2, ti = lax.top_k(sim, 2)
        acc = acc + 1e-20 * (t2.sum() + ti.sum())
        if stage == "topk":
            return (arch, acc), None
        simm = jnp.where(V1[:, None], sim, -jnp.inf)
        col_max = jnp.max(simm, axis=0)
        acc = acc + 1e-20 * col_max.sum()
        if stage == "colmax":
            return (arch, acc), None
        k1 = D1.shape[0]
        rows = jnp.arange(k1, dtype=jnp.int32)[:, None]
        first = jnp.min(jnp.where(simm == col_max[None, :], rows, k1),
                        axis=0)
        acc = acc + 1e-20 * first.sum()
        return (arch, acc), None
    return b


chain_ms(mk("mm"), "matmul+mask only", c0)
chain_ms(mk("topk"), "+ top_k", c0)
chain_ms(mk("colmax"), "+ col_max", c0)
chain_ms(mk("first"), "+ first-index", c0)


def mk2(stage):
    def b(carry, _):
        arch, acc = carry
        arch = arch._replace(desc=arch.desc.at[0, 0].add(1e-20))
        sim = jnp.einsum("id,jd->ij", D1, arch.desc,
                         preferred_element_type=jnp.float32)
        sim = jnp.where(arch.valid[None, :], sim, -jnp.inf)
        t2, ti = lax.top_k(sim, 2)
        s1, s2 = t2[:, 0], t2[:, 1]
        best = ti[:, 0]
        k1 = D1.shape[0]
        simm = jnp.where(V1[:, None], sim, -jnp.inf)
        col_max = jnp.max(simm, axis=0)
        rows = jnp.arange(k1, dtype=jnp.int32)[:, None]
        first = jnp.min(jnp.where(simm == col_max[None, :], rows, k1),
                        axis=0)
        if stage == "gather_first":
            acc = acc + 1e-20 * (first[best].sum() + s1.sum())
        elif stage == "mutual_eq":
            ok = first[best] == jnp.arange(k1)
            acc = acc + 1e-20 * (ok.sum() + s1.sum())
        elif stage == "ratio":
            ratio_ok = (2.0 - 2.0 * s1) < 0.64 * (2.0 - 2.0 * s2)
            ok = V1 & ratio_ok & jnp.isfinite(s1)
            acc = acc + 1e-20 * (ok.sum() + s1.sum())
        elif stage == "all":
            ratio_ok = (2.0 - 2.0 * s1) < 0.64 * (2.0 - 2.0 * s2)
            ok = (V1 & ratio_ok & jnp.isfinite(s1)
                  & (first[best] == jnp.arange(k1)))
            acc = acc + 1e-20 * (ok.sum() + s1.sum())
        return (arch, acc), None
    return b


chain_ms(mk2("gather_first"), "mk2: first[best]", c0)
chain_ms(mk2("mutual_eq"), "mk2: first[best]==arange", c0)
chain_ms(mk2("ratio"), "mk2: ratio chain only", c0)
chain_ms(mk2("all"), "mk2: full ok", c0)
