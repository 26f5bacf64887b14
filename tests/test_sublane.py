"""Property tests for the gather-free compaction/expansion routing
(ops/sublane.py) against straightforward numpy references."""

import numpy as np
import jax.numpy as jnp

from ls1_mardyn_tpu.ops.sublane import (
    sublane_compact,
    sublane_expand,
    sublane_rank,
)


def _np_compact(mask, col):
    out = np.zeros_like(col)
    for b in range(mask.shape[1]):
        vals = col[mask[:, b], b]
        out[: len(vals), b] = vals
    return out


def _np_expand(free, col):
    out = np.zeros_like(col)
    for b in range(free.shape[1]):
        idx = np.nonzero(free[:, b])[0]
        out[idx, b] = col[: len(idx), b]
    return out


def test_sublane_rank():
    rng = np.random.default_rng(0)
    m = rng.random((64, 256)) < 0.3
    r = np.asarray(sublane_rank(jnp.asarray(m)))
    expect = np.cumsum(m, axis=0) - m
    np.testing.assert_array_equal(r, expect)


def test_sublane_compact_random():
    rng = np.random.default_rng(1)
    for L, p in ((32, 0.1), (32, 0.5), (64, 0.9), (8, 0.3), (64, 0.02)):
        m = rng.random((L, 512)) < p
        c1 = rng.standard_normal((L, 512)).astype(np.float32)
        c2 = rng.standard_normal((L, 512)).astype(np.float32)
        o1, o2 = sublane_compact(jnp.asarray(m), [jnp.asarray(c1), jnp.asarray(c2)])
        np.testing.assert_array_equal(np.asarray(o1), _np_compact(m, c1))
        np.testing.assert_array_equal(np.asarray(o2), _np_compact(m, c2))


def test_sublane_compact_edge_masks():
    for m in (
        np.zeros((16, 4), bool),
        np.ones((16, 4), bool),
        np.eye(16, 4, dtype=bool),
    ):
        c = np.arange(64, dtype=np.float32).reshape(16, 4)
        (o,) = sublane_compact(jnp.asarray(m), [jnp.asarray(c)])
        np.testing.assert_array_equal(np.asarray(o), _np_compact(m, c))


def test_sublane_expand_random():
    rng = np.random.default_rng(2)
    for L, p in ((32, 0.1), (32, 0.6), (64, 0.95), (8, 0.4)):
        free = rng.random((L, 512)) < p
        col = rng.standard_normal((L, 512)).astype(np.float32)
        # only the first count(free) entries of col are meaningful
        (o,) = sublane_expand(jnp.asarray(free), [jnp.asarray(col)])
        np.testing.assert_array_equal(np.asarray(o), _np_expand(free, col))


def test_expand_inverts_compact():
    rng = np.random.default_rng(3)
    m = rng.random((32, 1024)) < 0.5
    c = rng.standard_normal((32, 1024)).astype(np.float32)
    cm = np.where(m, c, 0.0)
    (packed,) = sublane_compact(jnp.asarray(m), [jnp.asarray(c)])
    (back,) = sublane_expand(jnp.asarray(m), [packed])
    np.testing.assert_array_equal(np.asarray(back), cm)


def test_batched_shapes():
    rng = np.random.default_rng(4)
    m = rng.random((3, 16, 130) ) < 0.4
    c = rng.standard_normal((3, 16, 130)).astype(np.float32)
    (o,) = sublane_compact(jnp.asarray(m), [jnp.asarray(c)])
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(o)[b], _np_compact(m[b], c[b]))
