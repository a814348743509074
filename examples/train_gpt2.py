#!/usr/bin/env python
"""Train a small GPT-2 on synthetic data with the sharded trainer.

Demonstrates the training tier (photonic_flash_attention_tpu.training):
mesh-sharded train steps, gradient accumulation, remat, and the
prefetching data pipeline. Runs on one chip, N chips (data x model
mesh), or the CPU virtual mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import itertools

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import optax

from photonic_flash_attention_tpu.models.gpt2 import (
    GPT2Config,
    GPT2LMHead,
    param_sharding_rules,
)
from photonic_flash_attention_tpu.parallel.mesh import create_mesh
from photonic_flash_attention_tpu.training import (
    DataPipeline,
    Trainer,
    synthetic_lm_batches,
)


def main() -> None:
    cfg = GPT2Config.tiny()
    model = GPT2LMHead(cfg)
    n = len(jax.devices())
    mesh = specs = None
    if n > 1:
        model_par = 2 if n % 2 == 0 else 1
        mesh = create_mesh((n // model_par, model_par), ("data", "model"))
        sample = next(synthetic_lm_batches(batch=1, seq=8, vocab=cfg.vocab_size))
        variables = model.init(jax.random.PRNGKey(0), jax.numpy.asarray(sample["input_ids"]))
        specs = param_sharding_rules(variables["params"], ("data", "model"))
        print(f"mesh: {mesh}")

    trainer = Trainer(
        model,
        optax.adamw(3e-4, weight_decay=0.01),
        mesh=mesh,
        param_specs=specs,
        accum_steps=2,
        remat=True,
    )
    batches = synthetic_lm_batches(
        batch=8, seq=128, vocab=cfg.vocab_size, accum_steps=2
    )
    state = trainer.init_state(jax.random.PRNGKey(0), next(batches))

    with DataPipeline(itertools.islice(batches, 50), prefetch=2) as pipe:
        state = trainer.fit(state, pipe, log_every=10)

    eval_batches = synthetic_lm_batches(
        batch=8, seq=128, vocab=cfg.vocab_size, seed=1
    )
    loss = trainer.evaluate(state, itertools.islice(eval_batches, 4))
    print(f"final step {int(state.step)}, eval loss {loss:.4f}")


if __name__ == "__main__":
    main()
