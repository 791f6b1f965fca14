"""Micro-bench: pair->gaussian gradient reduction formulations on TPU.

The backward's [P_aligned, 9] -> [N, 9] reduction (scatter-add at
composite.py:736) plus the [9, P] -> [P, 9] transpose feeding it cost
~5.5 ms of the 13.2 ms bench step. Candidates:

  A  current: rows.T mask + at[gid].add               (unsorted aligned gids)
  B  gauss-major gather + cumsum + boundary diff      (needs an inv-perm
     table built in binning's integer domain: one extra u32 sort)
  C  the extra u32 sort that B needs (cost it separately)

Shapes: bench 50k (P 279k) and garden 1M (P 2.46M).
"""
import jax
import jax.numpy as jnp

from tpugs.utils.profiling import device_time


def bench(name, fn, carry, k=20):
    ms = device_time(fn, carry, k=k, rounds=2) * 1e3
    print(f"{name:44s} {ms:8.3f} ms")
    return ms


def run(n, p, n_seg):
    print(f"--- N={n} P_aligned={p}")
    key = jax.random.PRNGKey(0)
    d_attr_t = jax.random.normal(key, (16, p), jnp.float32)  # [ATTR_ROWS~16, P]
    gid = jax.random.randint(key, (p,), 0, n)
    valid = jax.random.uniform(key, (p,)) < 0.9
    # B's tables: a random perm standing in for aligned_pos_e, and segment
    # boundaries (n_seg gaussian spans over the expansion layout).
    perm = jax.random.permutation(key, p)
    bounds = jnp.sort(jax.random.randint(key, (n,), 0, p))

    def a_current(c, it):
        z, dat, g, v = c
        dat = dat + z
        rows = dat[:9, :].T  # the transpose the scatter layout forces
        rows = jnp.where(v[:, None], rows, 0.0)
        safe = jnp.where(v, g, 0)
        acc = jnp.zeros((n, 9), jnp.float32).at[safe].add(rows)
        return (jnp.tanh(jnp.sum(acc)) * 1e-20 + z * 0.5, dat, g, v)

    def b_gather_cumsum(c, it):
        z, dat, pm, bd, v = c
        dat = dat + z
        rows = dat[:9, :].T[pm]  # gauss-major order
        rows = jnp.where(v[pm][:, None], rows, 0.0)
        cs = jnp.cumsum(rows, axis=0)
        # acc[g] = cs[bounds[g+1]-1] - cs[bounds[g]-1]
        hi = jnp.concatenate([bd[1:], jnp.asarray([p])]) - 1
        lo = bd - 1
        acc = cs[hi] - jnp.where(lo[:, None] >= 0, cs[jnp.maximum(lo, 0)], 0.0)
        return (jnp.tanh(jnp.sum(acc)) * 1e-20 + z * 0.5, dat, pm, bd, v)

    def b2_gather_cumsum_t(c, it):
        # cumsum along lanes in [9, P] layout; boundary gather stays rows.
        z, dat, pm, bd, v = c
        dat = dat + z
        rows = jnp.where(v[None, :], dat[:9, :], 0.0)
        cs = jnp.cumsum(rows, axis=1)
        hi = jnp.concatenate([bd[1:], jnp.asarray([p])]) - 1
        acc = cs[:, hi] - cs[:, jnp.maximum(bd - 1, 0)]
        return (jnp.tanh(jnp.sum(acc)) * 1e-20 + z * 0.5, dat, pm, bd, v)

    def c_sort(c, it):
        z, k1, k2 = c
        k1 = k1 + z.astype(jnp.uint32)
        s = jax.lax.sort((k1, k2), num_keys=1)
        return (jnp.tanh(jnp.sum(s[1])) * 1e-20 + z * 0.5, k1, k2)

    z = jnp.zeros(())
    bench("A current transpose+scatter", a_current, (z, d_attr_t, gid, valid))
    bench("B gather+cumsum+diff", b_gather_cumsum, (z, d_attr_t, perm, bounds, valid))
    bench("B2 cumsum-in-[9,P]+lane-gather", b2_gather_cumsum_t,
          (z, d_attr_t, perm, bounds, valid))
    bench("C one extra u32 sort (table build)", c_sort,
          (z, gid.astype(jnp.uint32), perm.astype(jnp.uint32)))


run(50_000, 279_040, 50_000)
run(1_000_000, 2_460_000 // 512 * 512, 1_000_000)
