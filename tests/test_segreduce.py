"""Unit tests for the monotone segment-reduce kernel (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _oracle(rows, estart, ecount, n_pad):
    """Direct per-interval sum."""
    out = np.zeros((rows.shape[1], n_pad), np.float32)
    for g in range(n_pad):
        s, c = int(estart[g]), int(ecount[g])
        if c > 0:
            out[:, g] = rows[s:s + c].sum(axis=0)
    return out


def _make(seed, n_pad, avg_span, gap_every=7, empty_every=5):
    """Monotone non-overlapping intervals with gaps and empties."""
    from tpugs.ops.pallas.segreduce import C, IN_LANES

    rng = np.random.default_rng(seed)
    estart = np.zeros(n_pad, np.int32)
    ecount = np.zeros(n_pad, np.int32)
    pos = 0
    for g in range(n_pad):
        if empty_every and g % empty_every == 0:
            estart[g], ecount[g] = pos, 0
            continue
        if gap_every and g % gap_every == 0:
            pos += int(rng.integers(1, 9))  # unowned gap slots
        c = max(1, int(rng.poisson(avg_span)))
        estart[g], ecount[g] = pos, c
        pos += c
    end = pos
    p_in = (-(-(end + C) // C)) * C
    rows = rng.normal(0, 1, (p_in, IN_LANES)).astype(np.float32)
    return rows, estart, ecount, end, p_in


@pytest.mark.parametrize("n_pad,avg_span", [(256, 4), (640, 2), (128, 40)])
def test_segreduce_matches_oracle(n_pad, avg_span):
    from tpugs.ops.pallas.segreduce import segment_reduce_pallas

    rows, estart, ecount, end, _ = _make(0, n_pad, avg_span)
    out = segment_reduce_pallas(
        jnp.asarray(rows), jnp.asarray(estart), jnp.asarray(ecount),
        jnp.asarray(end, jnp.int32), interpret=True,
    )
    ref = _oracle(rows[:, :out.shape[0]], estart, ecount, n_pad)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-5)


def test_segreduce_single_huge_segment():
    """One segment spanning many inner chunks (big-gaussian case)."""
    from tpugs.ops.pallas.segreduce import C, IN_LANES, segment_reduce_pallas

    rng = np.random.default_rng(3)
    n_pad, span = 130, 5 * C + 37
    estart = np.zeros(n_pad, np.int32)
    ecount = np.zeros(n_pad, np.int32)
    estart[1], ecount[1] = 11, span
    estart[2:] = 11 + span
    end = 11 + span
    p_in = (-(-(end + C) // C)) * C
    rows = rng.normal(0, 1, (p_in, IN_LANES)).astype(np.float32)
    out = segment_reduce_pallas(
        jnp.asarray(rows), jnp.asarray(estart), jnp.asarray(ecount),
        jnp.asarray(end, jnp.int32), interpret=True,
    )
    ref = _oracle(rows[:, :out.shape[0]], estart, ecount, n_pad)
    # Summation order differs from numpy's pairwise sum: ~eps * sqrt(span).
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-3)


def test_segreduce_all_empty():
    from tpugs.ops.pallas.segreduce import C, IN_LANES, segment_reduce_pallas

    n_pad = 256
    rows = np.ones((2 * C, IN_LANES), np.float32)
    out = segment_reduce_pallas(
        jnp.asarray(rows), jnp.zeros(n_pad, jnp.int32),
        jnp.zeros(n_pad, jnp.int32), jnp.asarray(0, jnp.int32),
        interpret=True,
    )
    assert float(jnp.abs(out).max()) == 0.0
