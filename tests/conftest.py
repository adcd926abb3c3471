"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing real numerics on tiny models
(SURVEY.md §4) while making single-host tests representative of multi-host
SPMD: JAX treats N virtual CPU devices identically to N TPU chips for
sharding/collective semantics.

Note: the environment's TPU plugin imports jax at interpreter start and pins
``jax_platforms``; we override via jax.config (which works post-import as long
as no backend has been initialized yet). Set GANQ_TPU_TEST_TPU=1 to run the
suite against the real chip instead.
"""

import os

import jax

if not os.environ.get("GANQ_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

RAND_SEED = 898  # same test seed as the reference (SURVEY.md §4)


@pytest.fixture
def rng():
    return np.random.default_rng(RAND_SEED)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module. A full-suite run
    in one process accumulates hundreds of XLA CPU compilations; letting
    that state grow unboundedly has produced a segfault inside
    backend_compile_and_load near the end of the suite (every test passes
    file-by-file). Each module compiles its own tiny shapes anyway, so
    clearing between modules costs nothing."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()
