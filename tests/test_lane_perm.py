"""Beneš lane-routing (ops/lane_perm.py): routing-mask construction must
realize arbitrary permutations exactly, and the Pallas application must
match numpy — the TPU-native analog of exllama's act-order column remap
(reference gptqmodel_ext/exllama/cuda_func/column_remap.cu)."""

import os

import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import jax
import jax.numpy as jnp

from ganq_tpu.ops.lane_perm import (apply_benes_np, benes_masks,
                                    benes_strides, lane_permute)


@pytest.mark.parametrize("n", [2, 4, 16, 128, 1024])
def test_benes_masks_realize_any_permutation(rng, n):
    for _ in range(4):
        p = rng.permutation(n)
        m = benes_masks(p)
        assert m.shape == (2 * int(np.log2(n)) - 1, n)
        x = rng.normal(size=(3, n)).astype(np.float32)
        np.testing.assert_array_equal(apply_benes_np(x, m), x[:, p])


def test_benes_identity_is_all_zero():
    assert benes_masks(np.arange(256)).sum() == 0


def test_lane_permute_pallas_matches_numpy(rng):
    n, B = 512, 8
    p = rng.permutation(n)
    masks = jnp.asarray(benes_masks(p), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))

    def kern(m_ref, x_ref, o_ref):
        o_ref[:] = lane_permute(x_ref[:], m_ref[:])

    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        interpret=not os.environ.get("GANQ_TPU_TEST_TPU"))
    y = jax.jit(f)(masks, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[:, p])


def test_lane_permute_row_chunking(rng):
    """Rows beyond chunk_rows are processed in slices (the in-kernel
    register-pressure guard) with identical results. pltpu.roll only has
    kernel semantics, so this runs inside a (interpret-mode) pallas_call."""
    n, B = 256, 32
    p = rng.permutation(n)
    masks = jnp.asarray(benes_masks(p))
    x = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))

    def kern(m_ref, x_ref, o_ref):
        o_ref[:] = lane_permute(x_ref[:], m_ref[:], chunk_rows=8)

    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        interpret=not os.environ.get("GANQ_TPU_TEST_TPU"))
    y = jax.jit(f)(masks, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[:, p])


def test_benes_strides_shape():
    assert benes_strides(2) == [1]
    assert benes_strides(8) == [4, 2, 1, 2, 4]
    assert len(benes_strides(4096)) == 23
