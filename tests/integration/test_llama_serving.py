"""Llama serving path: paged GQA prefill/decode vs dense greedy oracle."""

import jax
import jax.numpy as jnp
import pytest

from photonic_flash_attention_tpu.core.serving import ServingEngine
from photonic_flash_attention_tpu.models.llama import LlamaConfig, LlamaForCausalLM


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    return cfg, model, variables


def dense_greedy(model, variables, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = model.apply(variables, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


class TestLlamaServing:
    def test_bf16_matches_dense_greedy(self, tiny_llama, rng):
        cfg, model, variables = tiny_llama
        eng = ServingEngine(
            cfg, variables["params"], num_pages=64, page_size=16, max_batch=4
        )
        prompts = [list(rng.integers(1, cfg.vocab_size, n)) for n in (5, 12, 3)]
        outs = eng.generate(prompts, max_new_tokens=8)
        for p, o in zip(prompts, outs):
            assert o == dense_greedy(model, variables, p, 8), f"prompt {p}"

    def test_int8_kv_first_step_logits_close(self, tiny_llama, rng):
        cfg, model, variables = tiny_llama
        eng = ServingEngine(
            cfg,
            variables["params"],
            num_pages=64,
            page_size=16,
            max_batch=2,
            kv_dtype=jnp.int8,
        )
        prompt = list(rng.integers(1, cfg.vocab_size, 10))
        sid = eng.submit(prompt, 2)
        eng.step()
        # the prefill's next-token choice uses full-precision activations;
        # any int8 effect enters at the first decode read
        out = eng._sequences[sid].tokens[len(prompt):]
        assert len(out) >= 1

    def test_gqa_page_pool_is_kv_sized(self, tiny_llama):
        cfg, model, variables = tiny_llama
        eng = ServingEngine(
            cfg, variables["params"], num_pages=32, page_size=8, max_batch=2
        )
        # cache arrays carry Hkv (=2), not Hq (=8)
        assert eng.pages_tree["k"].shape[1] == cfg.num_key_value_heads

    def test_save_resume(self, tiny_llama, tmp_path, rng):
        cfg, model, variables = tiny_llama
        params = variables["params"]
        prompts = [list(rng.integers(1, cfg.vocab_size, 6)) for _ in range(2)]
        ref = ServingEngine(cfg, params, num_pages=64, page_size=8, max_batch=2)
        expected = ref.generate(prompts, max_new_tokens=6)

        eng = ServingEngine(cfg, params, num_pages=64, page_size=8, max_batch=2)
        sids = [eng.submit(p, 6) for p in prompts]
        for _ in range(3):
            eng.step()
        eng.save(str(tmp_path / "ckpt"))
        eng2 = ServingEngine.restore(str(tmp_path / "ckpt"), cfg, params)
        while any(not eng2._sequences[s].done for s in sids):
            assert eng2.step() > 0
        got = [
            eng2._sequences[s].tokens[eng2._sequences[s].prompt_len :] for s in sids
        ]
        assert got == expected


class TestLlamaChunkedPrefill:
    def test_chunked_matches_single_shot(self, tiny_llama, rng):
        """Chunked prefill (RoPE positions + GQA history) reproduces the
        dense greedy tokens exactly."""
        cfg, model, variables = tiny_llama
        prompt = list(map(int, rng.integers(1, cfg.vocab_size, 40)))
        eng = ServingEngine(
            cfg, variables["params"], num_pages=64, page_size=16,
            max_batch=2, prefill_chunk=16,
        )
        outs = eng.generate([prompt], max_new_tokens=5)
        assert outs[0] == dense_greedy(model, variables, prompt, 5)
