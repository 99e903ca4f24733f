"""Build a complete tiny HF Qwen2 model dir (weights + tokenizer + chat
template) entirely offline, for CLI-level end-to-end tests and benches."""

import json
import os

CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] + '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)

SAMPLE_TEXT = """
What is 2+2? The answer is 4. STEP-1: <think> Let me compute this. </think>
<answer> 42 </answer> <tool_call> {"name": "execute_python_code"} </tool_call>
```python
print(1 + 1)
```
Solve the problem step by step. The final answer is boxed.
numbers 0 1 2 3 4 5 6 7 8 9 10 100 999 math sqrt frac sum product
""" * 4


def build_tiny_model_dir(path: str, *, hidden=64, layers=2, heads=4, kv_heads=2,
                         inter=128, vocab=2000, seed=0) -> str:
    """Creates config.json, model.safetensors, tokenizer.json at `path`."""
    os.makedirs(path, exist_ok=True)
    _build_tokenizer(path, vocab)
    _build_weights(path, hidden, layers, heads, kv_heads, inter, vocab, seed)
    return path


def _build_tokenizer(path: str, vocab: int):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab - 4,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>", "<pad>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator([SAMPLE_TEXT], trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|im_end|>",
        pad_token="<pad>",
        bos_token=None,
        chat_template=CHAT_TEMPLATE,
    )
    fast.save_pretrained(path)


def _build_weights(path, hidden, layers, heads, kv_heads, inter, vocab, seed):
    import numpy as np
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    dh = hidden // heads
    sd = {}

    def w(name, shape, scale=None):
        scale = scale if scale is not None else 1.0 / np.sqrt(shape[-1])
        sd[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    w("model.embed_tokens.weight", (vocab, hidden), 0.02)
    for i in range(layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(hidden, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
        w(p + "self_attn.q_proj.weight", (heads * dh, hidden))
        sd[p + "self_attn.q_proj.bias"] = np.zeros(heads * dh, np.float32)
        w(p + "self_attn.k_proj.weight", (kv_heads * dh, hidden))
        sd[p + "self_attn.k_proj.bias"] = np.zeros(kv_heads * dh, np.float32)
        w(p + "self_attn.v_proj.weight", (kv_heads * dh, hidden))
        sd[p + "self_attn.v_proj.bias"] = np.zeros(kv_heads * dh, np.float32)
        w(p + "self_attn.o_proj.weight", (hidden, heads * dh))
        w(p + "mlp.gate_proj.weight", (inter, hidden))
        w(p + "mlp.up_proj.weight", (inter, hidden))
        w(p + "mlp.down_proj.weight", (hidden, inter))
    sd["model.norm.weight"] = np.ones(hidden, np.float32)
    save_file(sd, os.path.join(path, "model.safetensors"))

    cfg = dict(
        model_type="qwen2",
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=4096,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
