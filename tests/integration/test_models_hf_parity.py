"""HF-parity tests for the BERT and T5 families.

The reference's conversion suite validates weight transfer per family
(reference integration/pytorch/convert.py:361-450). Here we go further:
construct the HF torch model from a config (random weights, no network),
transfer the weights, and require the flax forward to match the torch
forward numerically — the strongest possible conversion check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ..conftest import rel_err_norm

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _bert_pair():
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    from photonic_flash_attention_tpu.models.bert import transfer_hf_bert

    torch.manual_seed(0)
    hf = HFBertModel(
        HFBertConfig(
            vocab_size=128,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=64,
        )
    ).eval()
    model, variables, cfg = transfer_hf_bert(hf, dtype=jnp.float32)
    return hf, model, variables, cfg


def _t5_pair(lm_head=False):
    from transformers import T5Config as HFT5Config

    from photonic_flash_attention_tpu.models.t5 import transfer_hf_t5

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=128,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        dropout_rate=0.0,
    )
    if lm_head:
        from transformers import T5ForConditionalGeneration as HFT5

        hf = HFT5(hf_cfg).eval()
    else:
        from transformers import T5Model as HFT5Model

        hf = HFT5Model(hf_cfg).eval()
    model, variables, cfg = transfer_hf_t5(hf, dtype=jnp.float32)
    return hf, model, variables, cfg


class TestBertParity:
    def test_hidden_states_match_hf(self, rng):
        hf, model, variables, cfg = _bert_pair()
        ids = rng.integers(0, 128, (2, 32))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
        out, pooled = model.apply(variables, jnp.asarray(ids, jnp.int32))
        assert rel_err_norm(out, ref) < 1e-4
        with torch.no_grad():
            ref_pooled = hf(torch.tensor(ids)).pooler_output.numpy()
        assert rel_err_norm(pooled, ref_pooled) < 1e-4

    def test_padding_mask_matches_hf(self, rng):
        hf, model, variables, cfg = _bert_pair()
        ids = rng.integers(0, 128, (2, 32))
        mask = np.ones((2, 32), np.int64)
        mask[:, 24:] = 0
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        out, _ = model.apply(
            variables, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
        )
        # HF uses a -10k additive mask (small leakage); ours is exact.
        assert rel_err_norm(out[:, :24], ref[:, :24]) < 1e-3

    def test_token_type_ids(self, rng):
        hf, model, variables, cfg = _bert_pair()
        ids = rng.integers(0, 128, (1, 16))
        tt = np.zeros((1, 16), np.int64)
        tt[:, 8:] = 1
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids), token_type_ids=torch.tensor(tt)
            ).last_hidden_state.numpy()
        out, _ = model.apply(
            variables,
            jnp.asarray(ids, jnp.int32),
            token_type_ids=jnp.asarray(tt, jnp.int32),
        )
        assert rel_err_norm(out, ref) < 1e-4

    def test_jit_and_finite(self, rng):
        _, model, variables, cfg = _bert_pair()
        ids = jnp.asarray(rng.integers(0, 128, (2, 32)), jnp.int32)
        out, _ = jax.jit(lambda v, i: model.apply(v, i))(variables, ids)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestT5Parity:
    def test_decoder_hidden_states_match_hf(self, rng):
        hf, model, variables, cfg = _t5_pair()
        enc_ids = rng.integers(0, 128, (2, 24))
        dec_ids = rng.integers(0, 128, (2, 16))
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(enc_ids),
                decoder_input_ids=torch.tensor(dec_ids),
            ).last_hidden_state.numpy()
        out = model.apply(
            variables, jnp.asarray(enc_ids, jnp.int32), jnp.asarray(dec_ids, jnp.int32)
        )
        assert rel_err_norm(out, ref) < 1e-4

    def test_lm_logits_match_hf(self, rng):
        hf, model, variables, cfg = _t5_pair(lm_head=True)
        enc_ids = rng.integers(0, 128, (1, 16))
        dec_ids = rng.integers(0, 128, (1, 12))
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(enc_ids),
                decoder_input_ids=torch.tensor(dec_ids),
            ).logits.numpy()
        out = model.apply(
            variables, jnp.asarray(enc_ids, jnp.int32), jnp.asarray(dec_ids, jnp.int32)
        )
        assert rel_err_norm(out, ref) < 1e-4

    def test_encoder_padding_mask(self, rng):
        hf, model, variables, cfg = _t5_pair()
        enc_ids = rng.integers(0, 128, (2, 24))
        dec_ids = rng.integers(0, 128, (2, 8))
        mask = np.ones((2, 24), np.int64)
        mask[:, 16:] = 0
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(enc_ids),
                attention_mask=torch.tensor(mask),
                decoder_input_ids=torch.tensor(dec_ids),
            ).last_hidden_state.numpy()
        out = model.apply(
            variables,
            jnp.asarray(enc_ids, jnp.int32),
            jnp.asarray(dec_ids, jnp.int32),
            attention_mask=jnp.asarray(mask, jnp.int32),
        )
        assert rel_err_norm(out, ref) < 1e-3

    def test_causality(self, rng):
        """Decoder output at position t must not depend on tokens > t."""
        _, model, variables, cfg = _t5_pair()
        enc_ids = jnp.asarray(rng.integers(0, 128, (1, 8)), jnp.int32)
        dec_a = rng.integers(0, 128, (1, 12))
        dec_b = dec_a.copy()
        dec_b[:, 8:] = (dec_b[:, 8:] + 1) % 128
        out_a = model.apply(variables, enc_ids, jnp.asarray(dec_a, jnp.int32))
        out_b = model.apply(variables, enc_ids, jnp.asarray(dec_b, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(out_a[:, :8]), np.asarray(out_b[:, :8]), atol=1e-5
        )

    def test_tiny_init_forward(self, rng):
        from photonic_flash_attention_tpu.models.t5 import (
            T5Config,
            T5ForConditionalGeneration,
        )

        cfg = T5Config.tiny()
        model = T5ForConditionalGeneration(
            T5Config(**{**cfg.__dict__, "dtype": jnp.float32})
        )
        enc = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
        dec = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), enc, dec)
        logits = jax.jit(lambda v, e, d: model.apply(v, e, d))(variables, enc, dec)
        assert logits.shape == (2, 8, cfg.vocab_size)
        assert bool(jnp.all(jnp.isfinite(logits)))


class TestConvertFamilies:
    def test_convert_bert(self, rng):
        from transformers import BertConfig as HFBertConfig
        from transformers import BertModel as HFBertModel

        from photonic_flash_attention_tpu.models.convert import (
            PhotonicConfig,
            convert_to_photonic,
        )

        torch.manual_seed(0)
        hf = HFBertModel(
            HFBertConfig(
                vocab_size=128,
                hidden_size=64,
                num_hidden_layers=2,
                num_attention_heads=4,
                intermediate_size=128,
                max_position_embeddings=64,
            )
        ).eval()
        model, variables, report = convert_to_photonic(
            hf, PhotonicConfig(dtype=jnp.float32)
        )
        assert report.model_family == "bert"
        assert report.conversion_rate == 1.0
        assert report.parameters_transferred > 0
        ids = jnp.asarray(rng.integers(0, 128, (1, 16)), jnp.int32)
        out, _ = model.apply(variables, ids)
        assert out.shape == (1, 16, 64)

    def test_convert_t5(self):
        from transformers import T5Config as HFT5Config
        from transformers import T5Model as HFT5Model

        from photonic_flash_attention_tpu.models.convert import (
            PhotonicConfig,
            convert_to_photonic,
        )

        torch.manual_seed(0)
        hf = HFT5Model(
            HFT5Config(
                vocab_size=128,
                d_model=64,
                d_kv=16,
                d_ff=128,
                num_layers=2,
                num_heads=4,
                dropout_rate=0.0,
            )
        ).eval()
        model, variables, report = convert_to_photonic(
            hf, PhotonicConfig(dtype=jnp.float32)
        )
        assert report.model_family == "t5"
        assert report.conversion_rate == 1.0


def _gpt2_pair():
    from transformers import GPT2Config as HFGPT2Config
    from transformers import GPT2LMHeadModel as HFGPT2

    from photonic_flash_attention_tpu.models.gpt2 import transfer_hf_gpt2

    torch.manual_seed(0)
    hf = HFGPT2(
        HFGPT2Config(
            vocab_size=128,
            n_positions=64,
            n_embd=64,
            n_layer=2,
            n_head=4,
            attn_pdrop=0.0,
            resid_pdrop=0.0,
            embd_pdrop=0.0,
        )
    ).eval()
    model, variables, cfg = transfer_hf_gpt2(hf, dtype=jnp.float32)
    return hf, model, variables, cfg


class TestGPT2Parity:
    """Offline parity for the flagship E2E family (BASELINE GPT-2-medium).

    Exercises the fused c_attn QKV split (reference convert.py:399-430)
    against the HF torch forward with random weights — no network.
    """

    def test_logits_match_hf(self, rng):
        hf, model, variables, cfg = _gpt2_pair()
        ids = rng.integers(0, 128, (2, 24))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        out = model.apply(variables, jnp.asarray(ids, jnp.int32))
        assert rel_err_norm(out, ref) < 1e-4

    def test_causality(self, rng):
        _, model, variables, cfg = _gpt2_pair()
        a = rng.integers(0, 128, (1, 16))
        b = a.copy()
        b[:, 12:] = (b[:, 12:] + 1) % 128
        out_a = model.apply(variables, jnp.asarray(a, jnp.int32))
        out_b = model.apply(variables, jnp.asarray(b, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(out_a[:, :12]), np.asarray(out_b[:, :12]), atol=1e-5
        )

    def test_convert_family(self, rng):
        from photonic_flash_attention_tpu.models.convert import (
            PhotonicConfig,
            convert_to_photonic,
        )

        hf, _, _, _ = _gpt2_pair()
        model, variables, report = convert_to_photonic(
            hf, PhotonicConfig(dtype=jnp.float32)
        )
        assert report.model_family == "gpt2"
        ids = rng.integers(0, 128, (1, 16))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        out = model.apply(variables, jnp.asarray(ids, jnp.int32))
        assert rel_err_norm(out, ref) < 1e-4

    def test_bare_gpt2model_prefix_normalization(self):
        """transfer accepts a bare GPT2Model (no 'transformer.' prefix)."""
        from transformers import GPT2Config as HFGPT2Config
        from transformers import GPT2Model as HFGPT2Model

        from photonic_flash_attention_tpu.models.gpt2 import transfer_hf_gpt2

        torch.manual_seed(0)
        hf = HFGPT2Model(
            HFGPT2Config(
                vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4
            )
        ).eval()
        model, variables, cfg = transfer_hf_gpt2(hf, dtype=jnp.float32)
        assert cfg.n_layer == 2


def _llama_pair():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    from photonic_flash_attention_tpu.models.llama import transfer_hf_llama

    torch.manual_seed(0)
    hf = HFLlama(
        HFLlamaConfig(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,  # GQA
            max_position_embeddings=64,
        )
    ).eval()
    model, variables, cfg = transfer_hf_llama(hf, dtype=jnp.float32)
    return hf, model, variables, cfg


class TestLlamaParity:
    def test_logits_match_hf(self, rng):
        hf, model, variables, cfg = _llama_pair()
        assert cfg.num_key_value_heads == 2
        ids = rng.integers(0, 128, (2, 24))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        out = model.apply(variables, jnp.asarray(ids, jnp.int32))
        assert rel_err_norm(out, ref) < 1e-4

    def test_causality(self, rng):
        _, model, variables, cfg = _llama_pair()
        a = rng.integers(0, 128, (1, 16))
        b = a.copy()
        b[:, 12:] = (b[:, 12:] + 1) % 128
        out_a = model.apply(variables, jnp.asarray(a, jnp.int32))
        out_b = model.apply(variables, jnp.asarray(b, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(out_a[:, :12]), np.asarray(out_b[:, :12]), atol=1e-5
        )

    def test_jit_tiny_init(self, rng):
        from photonic_flash_attention_tpu.models.llama import (
            LlamaConfig,
            LlamaForCausalLM,
        )

        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(
            LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
        )
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), ids)
        logits = jax.jit(lambda v, i: model.apply(v, i))(variables, ids)
        assert logits.shape == (2, 32, cfg.vocab_size)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_convert_family(self):
        from photonic_flash_attention_tpu.models.convert import (
            PhotonicConfig,
            convert_to_photonic,
        )

        hf, _, _, _ = _llama_pair()
        model, variables, report = convert_to_photonic(
            hf, PhotonicConfig(dtype=jnp.float32)
        )
        assert report.model_family == "llama"
        assert report.conversion_rate == 1.0

    def test_sharding_rules_cover_tree(self):
        from photonic_flash_attention_tpu.models.llama import (
            llama_param_sharding_rules,
        )

        _, model, variables, cfg = _llama_pair()
        specs = llama_param_sharding_rules(variables["params"])
        import jax as _jax

        flat_p = _jax.tree_util.tree_leaves(variables["params"])
        flat_s = _jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, type(specs))
        )
        # every param leaf has a spec (tree structures align)
        _jax.tree_util.tree_map(
            lambda p, s: None, variables["params"], specs,
            is_leaf=lambda x: hasattr(x, "shape") or x is None,
        )
        assert len(flat_p) > 0
