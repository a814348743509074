"""Serve GPT-2 with the continuous-batching engine + paged INT8 KV cache,
with the metrics dashboard running alongside.

Run: python examples/serve_gpt2.py  (downloads HF gpt2 weights unless
PFA_RANDOM_WEIGHTS=1 uses a random tiny model — useful offline).
"""

import os

import jax.numpy as jnp

from photonic_flash_attention_tpu.core.serving import ServingEngine
from photonic_flash_attention_tpu.monitoring.dashboard import MetricsServer


def main() -> None:
    if os.environ.get("PFA_RANDOM_WEIGHTS"):
        import jax

        from photonic_flash_attention_tpu.models.gpt2 import GPT2Config, GPT2LMHead

        cfg = GPT2Config.tiny()
        model = GPT2LMHead(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), ids)
    else:
        from photonic_flash_attention_tpu.models.gpt2 import load_hf_gpt2

        _, variables, cfg = load_hf_gpt2("gpt2")

    metrics = MetricsServer(port=8080)
    port = metrics.start()
    print(f"dashboard: http://localhost:{port}/  metrics: /metrics")

    eng = ServingEngine(
        cfg,
        variables["params"],
        kv_dtype=jnp.int8,  # INT8 paged KV cache
        max_batch=4,
    )
    prompts = [[464, 3290, 318], [15496, 995], [1, 2, 3, 4]]
    prompts = [[t % cfg.vocab_size for t in p] for p in prompts]
    outputs = eng.generate(prompts, max_new_tokens=16)
    for i, toks in enumerate(outputs):
        print(f"seq {i}: {toks}")
    print(eng.get_performance_stats())
    metrics.stop()


if __name__ == "__main__":
    main()
