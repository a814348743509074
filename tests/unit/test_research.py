"""Novel attention algorithms: shape/finite/behavioral checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.research.novel_algorithms import (
    HierarchicalAttention,
    QuantumInspiredAttention,
    ResearchBenchmark,
    SpectralAttention,
)

B, S, E, H = 2, 64, 128, 4


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.standard_normal((B, S, E)), jnp.float32)


@pytest.mark.parametrize(
    "module",
    [
        QuantumInspiredAttention(E, H),
        QuantumInspiredAttention(E, H, entangle=False),
        SpectralAttention(E, H, num_modes=16),
        HierarchicalAttention(E, H, num_levels=3),
    ],
    ids=["quantum", "quantum_noent", "spectral", "hierarchical"],
)
def test_forward_shape_finite(module, x):
    params = module.init(jax.random.PRNGKey(0), x)
    out = module.apply(params, x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_quantum_weights_are_normalized_intensities(x):
    """Interference weights sum to 1 per query row (measured power)."""
    mod = QuantumInspiredAttention(E, H, entangle=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    # no NaN even with zero inputs (degenerate intensity)
    out0 = mod.apply(params, jnp.zeros_like(x))
    assert bool(jnp.all(jnp.isfinite(out0)))


def test_spectral_is_sequence_dependent(x, rng):
    mod = SpectralAttention(E, H, num_modes=8)
    params = mod.init(jax.random.PRNGKey(0), x)
    out1 = mod.apply(params, x)
    x2 = jnp.flip(x, axis=1)
    out2 = mod.apply(params, x2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_hierarchical_levels_reduce(x):
    mod = HierarchicalAttention(E, H, num_levels=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == x.shape


def test_gradients_flow_all(x):
    for mod in (
        QuantumInspiredAttention(E, H),
        SpectralAttention(E, H, num_modes=8),
        HierarchicalAttention(E, H),
    ):
        params = mod.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_benchmark_framework(rng):
    bench = ResearchBenchmark(batch=1, seq=32, embed=64, heads=2)
    results = bench.run(iters=2)
    assert len(results) == 3
    assert all(r.finite for r in results)
    report = ResearchBenchmark.markdown_report(results)
    assert "quantum_inspired" in report and "| algorithm |" in report
