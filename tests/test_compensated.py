"""Compensated f32 reductions (ops/compensated.py) — the TPU accuracy
tier's accumulation path (full f64 crashes libtpu; SURVEY §7(f))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepflame_tpu.ops.compensated import dot2, sum2, two_sum
from deepflame_tpu.parallel.context import compensated, gsum

pytestmark = pytest.mark.smoke


def test_sum2_matches_f64_on_ill_conditioned_data():
    """1e6 f32 values with large cancellation: plain f32 sum loses ~4
    digits; the compensated sum matches the f64 reference ~1e-7 rel."""
    rng = np.random.default_rng(0)
    n = 1 << 20
    x64 = rng.normal(size=n) * np.exp(rng.uniform(0, 10, size=n))
    x64 = np.concatenate([x64, -x64 * (1 + 1e-9)])  # heavy cancellation
    rng.shuffle(x64)
    x32 = x64.astype(np.float32)
    ref = float(np.sum(x32.astype(np.float64)))    # exact given f32 inputs
    scale = float(np.sum(np.abs(x64)))
    plain = float(jax.jit(jnp.sum)(jnp.asarray(x32)))
    comp = float(jax.jit(sum2)(jnp.asarray(x32)))
    assert abs(comp - ref) / scale < 1e-7
    # and it is genuinely better than the plain f32 tree sum
    assert abs(comp - ref) <= abs(plain - ref) + 1e-30


def test_dot2_krylov_style():
    rng = np.random.default_rng(1)
    n = 1 << 19
    a = rng.normal(size=n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)
    ref = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    comp = float(jax.jit(dot2)(jnp.asarray(a), jnp.asarray(b)))
    scale = float(np.dot(np.abs(a.astype(np.float64)),
                         np.abs(b.astype(np.float64))))
    assert abs(comp - ref) / scale < 1e-7


def test_two_sum_recovers_error():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)
    s, err = two_sum(a, b)
    # a + b is not representable; s + err recovers it in f64
    assert float(jnp.asarray(s, jnp.float64) + jnp.asarray(err, jnp.float64)
                 ) == pytest.approx(1.0 + 1e-8, abs=1e-18)


def test_gsum_context_switch():
    x = jnp.asarray(np.random.default_rng(2).normal(size=4096),
                    jnp.float32)
    plain = float(gsum(x))
    with compensated():
        comp = float(gsum(x))
    assert np.isfinite(plain) and np.isfinite(comp)
    assert abs(plain - comp) / (abs(plain) + 1e-30) < 1e-4
