"""Pipeline parallelism (GPipe schedule) on a virtual stage mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photonic_flash_attention_tpu.parallel.mesh import create_mesh
from photonic_flash_attention_tpu.parallel.pipeline import make_pipeline
from photonic_flash_attention_tpu.utils.exceptions import DistributionError

from ..conftest import assert_close


def stage_fn(w, x):
    return jnp.tanh(x @ w)


def sequential(ws, x):
    for i in range(ws.shape[0]):
        x = stage_fn(ws[i], x)
    return x


@pytest.mark.parametrize("n_stages", [2, 4, 8])
def test_matches_sequential(rng, n_stages):
    d = 16
    ws = jnp.asarray(rng.standard_normal((n_stages, d, d)) * 0.5, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, d)), jnp.float32)
    mesh = create_mesh((n_stages,), ("stage",), jax.devices()[:n_stages])
    pipe = make_pipeline(mesh, stage_fn, num_microbatches=4)
    out = pipe(ws, x)
    assert_close(out, sequential(ws, x))


def test_single_microbatch(rng):
    d = 8
    ws = jnp.asarray(rng.standard_normal((4, d, d)) * 0.5, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, d)), jnp.float32)
    mesh = create_mesh((4,), ("stage",), jax.devices()[:4])
    pipe = make_pipeline(mesh, stage_fn, num_microbatches=1)
    assert_close(pipe(ws, x), sequential(ws, x))


def test_pytree_stage_params(rng):
    """Stage params as a pytree (kernel + bias per stage)."""
    d = 8

    def fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    params = {
        "w": jnp.asarray(rng.standard_normal((4, d, d)) * 0.5, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((4, d)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
    mesh = create_mesh((4,), ("stage",), jax.devices()[:4])
    pipe = make_pipeline(mesh, fn, num_microbatches=2)
    out = pipe(params, x)

    ref = x
    for i in range(4):
        ref = fn({"w": params["w"][i], "b": params["b"][i]}, ref)
    assert_close(out, ref)


def test_bad_inputs_rejected(rng):
    d = 8
    ws = jnp.asarray(rng.standard_normal((4, d, d)), jnp.float32)
    mesh = create_mesh((4,), ("stage",), jax.devices()[:4])
    pipe = make_pipeline(mesh, stage_fn, num_microbatches=3)
    x = jnp.zeros((8, d), jnp.float32)  # 8 % 3 != 0
    with pytest.raises(DistributionError):
        pipe(ws, x)
    with pytest.raises(DistributionError):
        make_pipeline(mesh, stage_fn, 2, stage_axis="nope")
    pipe2 = make_pipeline(mesh, stage_fn, num_microbatches=2)
    with pytest.raises(DistributionError):
        pipe2(ws[:3], x)  # wrong stage count
