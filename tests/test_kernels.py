"""Pallas kernel parity tests vs the XLA reference oracle — the strategy of
the reference's kernel suites (tests/test_kernel_output.py: torch kernel as
oracle, every backend must match within tolerance). On CPU the kernels run
under the Pallas TPU interpreter; the same tests run compiled on real TPU
with GANQ_TPU_TEST_TPU=1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ganq_tpu.ops import lut_matmul as lm
from ganq_tpu.ops import uniform_matmul as um
from ganq_tpu.ops.packing import pack_int_rows


@pytest.fixture
def interp():
    """Force interpreter mode when not on real TPU."""
    import os
    if os.environ.get("GANQ_TPU_TEST_TPU"):
        yield
    else:
        with pltpu.force_tpu_interpret_mode():
            yield


def make_lut_problem(rng, B, M, K, dtype=np.float32):
    x = rng.normal(size=(B, K)).astype(dtype)
    lut = np.sort(rng.normal(size=(M, 16)).astype(np.float32), axis=1)
    idx = rng.integers(0, 16, size=(M, K)).astype(np.int32)
    packed = pack_int_rows(jnp.asarray(idx), 4)
    return jnp.asarray(x), jnp.asarray(lut), packed, idx


@pytest.mark.parametrize("B,M,K", [(8, 256, 512), (1, 128, 256), (32, 512, 1024)])
def test_lut_matmul_matches_reference(rng, interp, B, M, K):
    x, lut, packed, idx = make_lut_problem(rng, B, M, K)
    ref = lm.lut_matmul_reference(x, lut, packed, 4)
    out = lm.lut_matmul(x, lut, packed, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_lut_matmul_bf16(rng, interp):
    x, lut, packed, idx = make_lut_problem(rng, 16, 256, 512)
    x = x.astype(jnp.bfloat16)
    ref = np.asarray(lm.lut_matmul_reference(x, lut, packed, 4), np.float32)
    out = np.asarray(lm.lut_matmul(x, lut, packed, 4), np.float32)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-1)


def test_lut_matmul_nondefault_bits_falls_back(rng):
    # bits != 4 silently uses the XLA reference path (capability fallback,
    # the analog of the reference's SUPPORTS_BITS validation)
    B, M, K = 4, 24, 64
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    lut = jnp.asarray(np.sort(rng.normal(size=(M, 4)).astype(np.float32), axis=1))
    idx = rng.integers(0, 4, size=(M, K)).astype(np.int32)
    packed = pack_int_rows(jnp.asarray(idx), 2)
    out = lm.lut_matmul(x, lut, packed, 2)
    ref = lm.lut_matmul_reference(x, lut, packed, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_select_tree_dequant_exact(rng, interp):
    """The 15-select tree must reproduce the gather exactly (it is the
    dequant, not an approximation)."""
    from jax.experimental import pallas as pl

    lut = np.sort(rng.normal(size=(64, 16)).astype(np.float32), axis=1)
    codes = rng.integers(0, 16, size=(64, 128)).astype(np.int32)

    def kernel(c_ref, l_ref, o_ref):
        o_ref[:] = lm._select_tree_dequant(c_ref[:], l_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    )(jnp.asarray(codes), jnp.asarray(lut))
    ref = np.take_along_axis(lut, codes, axis=1)
    # the tree is an arithmetic blend (a + b*(c-a)); fp cancellation allows
    # ~1-ulp deviation — far below the bf16 storage granularity of the lut
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def make_uniform_problem(rng, B, M, K, gs, bits=4):
    n_groups = K // gs if gs != -1 else 1
    maxq = 2 ** bits - 1
    x = rng.normal(size=(B, K)).astype(np.float32)
    qidx = rng.integers(0, maxq + 1, size=(M, K)).astype(np.int32)
    scales = (rng.random(size=(M, n_groups)).astype(np.float32) + 0.05)
    zeros = rng.integers(0, maxq + 1, size=(M, n_groups)).astype(np.float32)
    g_idx = (np.arange(K) // (gs if gs != -1 else K)).astype(np.int32)
    packed = pack_int_rows(jnp.asarray(qidx), bits)
    return (jnp.asarray(x), packed, jnp.asarray(scales), jnp.asarray(zeros),
            jnp.asarray(g_idx))


@pytest.mark.parametrize("gs", [32, 128, -1])
def test_uniform_matmul_matches_reference(rng, interp, gs):
    x, qw, s, z, g = make_uniform_problem(rng, 8, 256, 512, gs)
    ref = um.uniform_matmul_reference(x, qw, s, z, g, 4)
    out = um.uniform_matmul(x, qw, s, z, g, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_uniform_desc_act_falls_back(rng):
    x, qw, s, z, g = make_uniform_problem(rng, 4, 128, 256, 32)
    g_perm = np.asarray(g)[np.random.default_rng(0).permutation(256)]
    out = um.uniform_matmul(x, qw, s, z, jnp.asarray(g_perm), 4)
    ref = um.uniform_matmul_reference(x, qw, s, z, jnp.asarray(g_perm), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


@pytest.mark.parametrize("bits", [2, 3])
def test_lut_matmul_low_bits(rng, interp, bits):
    B, M, K = 8, 128, 256
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    lut = jnp.asarray(np.sort(rng.normal(size=(M, 2 ** bits)).astype(np.float32), axis=1))
    idx = rng.integers(0, 2 ** bits, size=(M, K)).astype(np.int32)
    packed = pack_int_rows(jnp.asarray(idx), bits)
    ref = lm.lut_matmul_reference(x, lut, packed, bits)
    out = lm.lut_matmul(x, lut, packed, bits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bits", [2, 3, 8])
def test_uniform_matmul_other_bits(rng, interp, bits):
    """The reference's kernels cover 2-8 bit (exllamav2 qdq_2..8); the
    pallas uniform kernel serves 2/3/4/8 via the planar packing."""
    K = 2048 if bits == 2 else 1024   # width must be 128-aligned
    x, qw, s, z, g = make_uniform_problem(rng, 8, 256, K, 128, bits)
    ref = um.uniform_matmul_reference(x, qw, s, z, g, bits)
    out = um.uniform_matmul(x, qw, s, z, g, bits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bits", [2, 3, 8])
def test_uniform_a8_other_bits(rng, interp, bits):
    """W{2,3,8}A8: centered int8 codes + zero-side offset keep the affine
    math exact vs the a8 oracle."""
    K = 2048 if bits == 2 else 1024
    x, qw, s, z, g = make_uniform_problem(rng, 8, 256, K, 128, bits)
    ref = um.uniform_a8_reference(x, qw, s, z, g, bits)
    out = um.uniform_a8_matmul(x, qw, s, z, g, bits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("gs", [128, 256, -1])
def test_uniform_a8_matches_a8_oracle(rng, interp, gs):
    """W4A8 kernel vs the pure-jnp oracle of the SAME math (activation int8
    quant + exact output-side affine correction) — tight tolerance, the only
    difference is accumulation order. K=1024 keeps the shapes inside the
    Pallas capability gate (width=128-aligned, seg 128 or full plane)."""
    x, qw, s, z, g = make_uniform_problem(rng, 8, 256, 1024, gs)
    ref = um.uniform_a8_reference(x, qw, s, z, g, 4)
    out = um.uniform_a8_matmul(x, qw, s, z, g, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_uniform_a8_close_to_full_precision(rng, interp):
    """The activation-quantization error vs the full-precision dequant
    matmul is bounded (same bound as w8a8: rowmax/254 per element)."""
    x, qw, s, z, g = make_uniform_problem(rng, 8, 256, 1024, 128)
    full = np.asarray(um.uniform_matmul_reference(x, qw, s, z, g, 4))
    out = np.asarray(um.uniform_a8_matmul(x, qw, s, z, g, 4))
    # near-zero outputs make elementwise relative error meaningless; the
    # right scale is the output RMS (same activation-quant noise as w8a8)
    rms = float(np.sqrt(np.mean(full ** 2)))
    assert np.max(np.abs(out - full)) / rms < 0.05


def test_uniform_a8_ineligible_shapes_fall_back_full_precision(rng):
    """Outside the capability gate (width not 128-aligned / misaligned seg /
    permuted g_idx) the a8 entry returns the FULL-PRECISION reference — a
    strictly more accurate fallback than the a8 math."""
    x, qw, s, z, g = make_uniform_problem(rng, 8, 256, 512, 32)
    out = um.uniform_a8_matmul(x, qw, s, z, g, 4)        # width=64: gated out
    full = um.uniform_matmul_reference(x, qw, s, z, g, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), rtol=1e-6)
    g_perm = np.asarray(g)[np.random.default_rng(0).permutation(512)]
    out2 = um.uniform_a8_matmul(x, qw, s, z, jnp.asarray(g_perm), 4)
    ref2 = um.uniform_matmul_reference(x, qw, s, z, jnp.asarray(g_perm), 4)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-5)
