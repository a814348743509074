"""Trainer: loss decreases, grad accumulation is exact, remat matches,
sharded steps run on the virtual mesh, pipeline prefetches.

The reference has no training tier (SURVEY.md §5.4: its only persistence
is the optimizer pickle); these tests define the new one's contract.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from photonic_flash_attention_tpu.models.gpt2 import (
    GPT2Config,
    GPT2LMHead,
    param_sharding_rules,
)
from photonic_flash_attention_tpu.parallel.mesh import create_mesh
from photonic_flash_attention_tpu.training import (
    DataPipeline,
    Trainer,
    TrainState,
    make_train_step,
    synthetic_lm_batches,
)

from ..conftest import assert_close


def _tiny_model():
    return GPT2LMHead(GPT2Config.tiny())


def _batches(accum=1, batch=4, seq=32, seed=0):
    cfg = GPT2Config.tiny()
    return synthetic_lm_batches(
        batch=batch, seq=seq, vocab=cfg.vocab_size, accum_steps=accum, seed=seed
    )


class TestTrainStep:
    def test_loss_decreases(self):
        model = _tiny_model()
        trainer = Trainer(model, optax.adam(1e-3))
        batch = next(_batches())
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        first = None
        # Overfit one fixed batch: loss must drop.
        for _ in range(10):
            state, metrics = trainer.train_step(state, batch)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first
        assert int(state.step) == 10

    def test_grad_accumulation_matches_large_batch(self):
        model = _tiny_model()
        tx = optax.sgd(1e-2)  # exact linearity: accum == big batch
        big = next(_batches(batch=8))
        micro = {
            k: v.reshape(4, 2, *v.shape[1:]) for k, v in big.items()
        }

        step1 = jax.jit(make_train_step(model.apply, tx, accum_steps=1))
        step4 = jax.jit(make_train_step(model.apply, tx, accum_steps=4))
        variables = model.init(jax.random.PRNGKey(0), big["input_ids"][:1, :8])
        params = variables["params"]
        s0 = TrainState(step=jnp.int32(0), params=params, opt_state=tx.init(params))

        s_big, m_big = step1(s0, {k: jnp.asarray(v) for k, v in big.items()})
        s_acc, m_acc = step4(s0, {k: jnp.asarray(v) for k, v in micro.items()})
        assert_close(m_big["loss"], m_acc["loss"], atol=1e-5, rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: assert_close(a, b, atol=1e-5, rtol=1e-5),
            s_big.params,
            s_acc.params,
        )

    def test_remat_matches_plain(self):
        model = _tiny_model()
        tx = optax.sgd(1e-2)
        batch = {k: jnp.asarray(v) for k, v in next(_batches()).items()}
        variables = model.init(jax.random.PRNGKey(0), batch["input_ids"][:1, :8])
        params = variables["params"]
        s0 = TrainState(step=jnp.int32(0), params=params, opt_state=tx.init(params))
        plain = jax.jit(make_train_step(model.apply, tx))(s0, batch)
        remat = jax.jit(make_train_step(model.apply, tx, remat=True))(s0, batch)
        assert_close(plain[1]["loss"], remat[1]["loss"], atol=1e-6, rtol=1e-6)

    def test_sharded_mesh_step(self):
        model = _tiny_model()
        mesh = create_mesh((2, 4), ("data", "model"))
        batch = next(_batches(batch=4))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["input_ids"][:1, :8])
        )
        specs = param_sharding_rules(variables["params"], ("data", "model"))
        trainer = Trainer(
            model, optax.adamw(1e-4), mesh=mesh, param_specs=specs
        )
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = trainer.train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_fit_and_history(self):
        model = _tiny_model()
        trainer = Trainer(model, optax.adam(1e-3))
        gen = _batches()
        state = trainer.init_state(jax.random.PRNGKey(0), next(gen))
        saves = []
        state = trainer.fit(
            state,
            itertools.islice(gen, 6),
            log_every=2,
            checkpoint_fn=lambda s, step: saves.append(step),
            checkpoint_every=3,
        )
        assert int(state.step) == 6
        assert trainer.history and saves == [3, 6]

    def test_evaluate(self):
        model = _tiny_model()
        trainer = Trainer(model, optax.adam(1e-3))
        gen = _batches()
        state = trainer.init_state(jax.random.PRNGKey(0), next(gen))
        loss = trainer.evaluate(state, itertools.islice(gen, 2))
        assert np.isfinite(loss) and loss > 0


class TestDataPipeline:
    def test_prefetch_order_and_close(self):
        src = ({"x": np.full((2, 2), i)} for i in range(5))
        with DataPipeline(src, prefetch=2) as pipe:
            got = [int(b["x"][0, 0]) for b in pipe]
        assert got == [0, 1, 2, 3, 4]

    def test_error_propagates(self):
        def bad():
            yield {"x": np.zeros((1,))}
            raise RuntimeError("boom")

        pipe = DataPipeline(bad())
        it = iter(pipe)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)

    def test_synthetic_shapes(self):
        b = next(synthetic_lm_batches(batch=3, seq=16, vocab=100, accum_steps=2))
        assert b["input_ids"].shape == (2, 3, 16)
        assert b["labels"].shape == (2, 3, 16)


def test_train_step_with_dropout_rng(rng):
    """Dropout-regularized training: fresh in-kernel attention-dropout
    masks per step, finite loss/grads, loss differs from eval-mode."""
    import dataclasses

    import optax

    from photonic_flash_attention_tpu.models.gpt2 import GPT2Config, GPT2LMHead
    from photonic_flash_attention_tpu.training.trainer import (
        TrainState,
        make_train_step,
    )

    cfg = dataclasses.replace(
        GPT2Config.tiny(), attn_pdrop=0.2, dtype=jnp.float32
    )
    model = GPT2LMHead(cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 64)), jnp.int32)
    batch = {"input_ids": ids, "labels": jnp.roll(ids, -1, axis=1)}
    variables = model.init(jax.random.PRNGKey(0), ids)
    tx = optax.sgd(1e-3)
    state = TrainState(
        step=jnp.int32(0),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
    )
    step_drop = make_train_step(
        model.apply, tx, dropout_rng=jax.random.PRNGKey(7)
    )
    step_eval = make_train_step(model.apply, tx)
    s1, m1 = step_drop(state, batch)
    _, m0 = step_eval(state, batch)
    assert bool(jnp.isfinite(m1["loss"])) and float(m1["grad_norm"]) > 0
    assert float(m1["loss"]) != float(m0["loss"])  # dropout changed the fwd
    # next step folds a different key -> different masks -> different loss
    s2, m2 = step_drop(s1, batch)
    assert float(m2["loss"]) != float(m1["loss"])
