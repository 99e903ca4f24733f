#!/usr/bin/env python
"""Full RL loop smoke on real hardware: MCTS rollouts through the real
engine (value-guided, fused h0 scoring) -> hyperbolic shaping -> jitted
GRPO+value update, N steps. Random small model; proves the end-to-end
training slice on TPU (SURVEY §7.2's final slice) and reports step timing.

Env: NL (layers, 8), H (hidden, 512), STEPS (2).
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import lapha_tpu

lapha_tpu.enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from lapha_tpu.models import Qwen2Config, qwen2
from lapha_tpu.train.config import MTPOConfig
from lapha_tpu.train.trainer import MTPOTrainer


class ChatTok:
    """Invertible whitespace tokenizer with a chat template."""

    eos_token_id = 1
    pad_token_id = 0

    def __init__(self):
        self.vocab = {"<eos>": 1, "<pad>": 0}
        self.words = {1: "<eos>", 0: "<pad>"}

    def _id(self, w):
        if w not in self.vocab:
            i = len(self.vocab)
            self.vocab[w] = i
            self.words[i] = w
        return self.vocab[w]

    def __call__(self, text, add_special_tokens=True, **kw):
        toks = re.findall(r"\n|\S+", text)
        return {"input_ids": [self._id(w) for w in toks]}

    def decode(self, ids, skip_special_tokens=True, **kw):
        words = [self.words.get(int(i), "?") for i in ids
                 if not (skip_special_tokens and int(i) in (0, 1))]
        out = []
        for w in words:
            if w == "\n":
                out.append("\n")
            else:
                if out and out[-1] != "\n":
                    out.append(" ")
                out.append(w)
        return "".join(out)

    def apply_chat_template(self, conversation, tools=None, tokenize=False,
                            add_generation_prompt=True, **kw):
        parts = [f"<|{m['role']}|> {m.get('content','')}" for m in conversation]
        if add_generation_prompt:
            parts.append("<|assistant|>")
        return "\n".join(parts) + "\n"


class PoorAgent(__import__("lapha_tpu.search", fromlist=["MCTSAgent"]).MCTSAgent):
    TOOLS = {}
    TOOLS_DESCRIPTION = ""
    SYSTEM_TEMPLATE = "Solve step by step. Limit {step_limit} steps."
    USER_TEMPLATE = "{support_material_str}\nQ: {question}"


def main():
    cfg = Qwen2Config(
        vocab_size=4096, hidden_size=int(os.getenv("H", "512")),
        intermediate_size=2 * int(os.getenv("H", "512")),
        num_hidden_layers=int(os.getenv("NL", "8")),
        num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=2048, dtype=jnp.bfloat16)
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    args = MTPOConfig(
        output_dir="/tmp/lapha-tpu-smoke", depth=3, breadth=4, num_sim=8,
        num_pos_sim=99, prune_per=4, num_groups=4, max_model_len=512,
        max_prompt_length=256, max_completion_length=48,
        per_device_train_batch_size=2, num_generations=2, save_steps=0,
        bf16=True, gradient_checkpointing=False, mesh_model=1,
        leaves_per_sim=2, temperature=0.9, top_k=20, top_p=0.95,
        debug_print=True,
    )
    dataset = [
        {"question": "what is 2 + 2 ?", "ground_truth": "4", "support_material_path": []},
        {"question": "what is 3 + 4 ?", "ground_truth": "7", "support_material_path": []},
    ]
    # synthetic deterministic reward with within-group variance: a random
    # model never emits the right <answer>, which would filter every group
    # (no reward variance, no correct-leaf anchors) and skip the update —
    # the smoke must drive rollout AND update on the device
    def smoke_reward(c, gt):
        # ~1/3 "correct": keeps within-group variance AND stays under the
        # trainer's avg_acc >= 0.8 stability skip
        return float(sum(map(ord, c)) % 3 == 0)

    trainer = MTPOTrainer(
        model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
        reward_fns=[smoke_reward],
        train_dataset=dataset, tokenizer=tok,
    )
    steps = int(os.getenv("STEPS", "2"))
    for i in range(steps):
        t0 = time.time()
        m = trainer.train_step(dataset)
        print(f"[tpu-smoke step {i}] {time.time()-t0:.1f}s "
              + " ".join(f"{k}={v:.4g}" for k, v in m.items()
                         if isinstance(v, (int, float))), flush=True)
        assert np.isfinite(m.get("loss", 0.0))

    # The reference-faithful group filters (reward variance, v_target>0,
    # avgAcc<0.8) rightly reject random-model trees, so drive the jitted
    # UPDATE explicitly on the rollout's own samples to prove the full
    # rollout->shaping->update path executes on the device.
    from lapha_tpu.search import LatentBank
    from lapha_tpu.train import losses
    from lapha_tpu.train.shaping import compute_action_rewards

    bank = LatentBank()
    agent = trainer._make_agent(bank)
    chains = agent.search(question=dataset[0]["question"], ground_truth="4",
                          support_material_path=None, cot=None)
    trainer._ensure_hid_idx_coverage(chains, bank, root_step=agent._root_step)
    compute_action_rewards(chains, trainer.reward_fns, "4", trainer.shaping_cfg,
                           bank=bank, root_step=agent._root_step)
    seen, samples = set(), []
    for ch in chains:
        for st in ch:
            if id(st) in seen or not st.get("prompt_ids") or not st.get("completion_ids"):
                continue
            seen.add(id(st))
            samples.append(dict(prompt_ids=list(map(int, st["prompt_ids"]))[-256:],
                                completion_ids=list(map(int, st["completion_ids"])),
                                reward=float(st.get("reward") or 0.0),
                                v_target=float(st.get("v_target") or 0.0)))
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1, max_prompt_length=256)
    kept = [samples[i] for i in packed.pop("kept").tolist()]
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = packed["ids"].shape[0]
    adv = np.zeros(Bb, np.float32)
    adv[: len(kept)] = [s["reward"] - 0.5 for s in kept]
    vt = np.zeros(Bb, np.float32)
    vt[: len(kept)] = [s["v_target"] for s in kept]
    batch["advantages"] = jnp.asarray(adv)
    batch["v_target"] = jnp.asarray(vt)
    t0 = time.time()
    with trainer.mesh:
        trainer.params, trainer.head, trainer.opt_state, mm = trainer._update(
            trainer.params, trainer.head, trainer.opt_state, batch, None)
    loss = float(np.asarray(mm["loss"]))
    print(f"[tpu-smoke update] {time.time()-t0:.1f}s "
          f"B={len(kept)} L={packed['ids'].shape[1]} loss={loss:.4f} "
          f"grad_norm={float(np.asarray(mm['grad_norm'])):.4f}", flush=True)
    assert np.isfinite(loss)
    print("TPU RL-loop smoke OK", flush=True)


if __name__ == "__main__":
    main()
