"""Trainer: loss math, shaping semantics, and a full tiny training step."""

import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.engine import FakeEngine, SamplingParams
from lapha_tpu.models import Qwen2Config, qwen2, value_model
from lapha_tpu.search import LatentBank, make_fake_value_fn
from lapha_tpu.train import (
    MTPOConfig,
    ShapingConfig,
    compute_action_rewards,
    fmt_bonus,
    math_reward,
)
from lapha_tpu.train import losses
from lapha_tpu.train.shaping import best_var_window_constrained

from test_search import ChatTok, PoorAgent, make_agent


# ------------------------------------------------------------------- config

def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("learning_rate: 2.0e-6\ndepth: 4\nloss_type: bnpo\nsome_unknown_key: 5\n")
    cfg = MTPOConfig.from_yaml(str(p))
    assert cfg.learning_rate == 2e-6 and cfg.depth == 4 and cfg.loss_type == "bnpo"
    assert "some_unknown_key" in cfg._ignored_yaml_keys


def test_config_validation():
    with pytest.raises(ValueError, match="linear"):
        MTPOConfig(value_head_type="qwen2")
    with pytest.raises(ValueError, match="num_generations"):
        MTPOConfig(num_generations=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        MTPOConfig(generation_batch_size=8, steps_per_generation=2)


# ------------------------------------------------------------------- rewards

def test_math_reward():
    assert math_reward("<answer>4\\sqrt{5}</answer>", "4\\sqrt{5}") == 1.0
    assert math_reward("<answer>5</answer>", "4") == 0.0
    assert math_reward("no tag", "4") == 0.0


def test_fmt_bonus():
    assert fmt_bonus("STEP-1:\n<think>x</think>") == 1.0
    assert fmt_bonus("STEP-2:\n<think>x</think>\n<answer>4</answer>") == 1.0
    assert fmt_bonus("STEP-1:\n<think>x</think> extra prose") == 0.0
    assert fmt_bonus("no header <think>x</think>") == 0.0
    assert fmt_bonus("STEP-1:\n<think>x</think>STEP-2:\n<think>y</think>") == 0.0


# ------------------------------------------------------------------- packing

def test_pack_samples_layout():
    samples = [
        dict(prompt_ids=[5, 6, 7], completion_ids=[8, 9]),
        dict(prompt_ids=[5], completion_ids=[9, 9, 9, 1, 9]),  # eos=1 mid-completion
    ]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1, max_prompt_length=10,
                                 pad_multiple=8, batch_multiple=2)
    assert packed["ids"].shape == (2, 8)
    np.testing.assert_array_equal(packed["ids"][0, :5], [5, 6, 7, 8, 9])
    # comp mask: stops after eos (keep eos itself)
    np.testing.assert_array_equal(packed["comp_mask"][1, :6], [0, 1, 1, 1, 1, 0])
    assert packed["valid"].tolist() == [1, 1]


def test_group_advantages_semantics():
    r = np.array([1.0, 0.0, 1.0, 1.0])
    g = np.array([0, 0, 1, 1])
    adv = losses.group_advantages(r, g, "none")
    np.testing.assert_allclose(adv, [0.5, -0.5, 0.0, 0.0], atol=1e-6)
    adv_g = losses.group_advantages(r, g, "group")
    assert adv_g[0] > 0 > adv_g[1]
    assert abs(adv_g[2]) < 1e-3  # zero-variance group -> ~0
    adv_b = losses.group_advantages(r, g, "batch")
    assert adv_b[0] > 0


def test_best_var_window():
    vals = np.array([0.9, 0.8, 0.5, 0.1, 0.0], np.float32)
    ok = np.ones_like(vals, bool)
    s, var = best_var_window_constrained(vals, ok, 3)
    assert s is not None
    assert s == 1 or s == 2  # the high-variance middle window


# ------------------------------------------------------------------- loss fn

@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    return cfg, params, head


def _make_batch(cfg, B=4, with_adv=True):
    rng = np.random.default_rng(0)
    # ragged completion lengths so grpo/bnpo/dr_grpo normalizations differ
    samples = [dict(prompt_ids=rng.integers(2, cfg.vocab_size, 6).tolist(),
                    completion_ids=rng.integers(2, cfg.vocab_size, 3 + 2 * i).tolist())
               for i in range(B)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1, max_prompt_length=64,
                                 pad_multiple=16, batch_multiple=4)
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = packed["ids"].shape[0]
    batch["advantages"] = jnp.asarray(np.r_[1.0, -0.5, 0.5, -0.2, np.zeros(Bb - 4)].astype(np.float32))
    batch["v_target"] = jnp.asarray(np.r_[1.0, 0.0, 0.5, 0.2, np.zeros(Bb - 4)].astype(np.float32))
    return batch


def test_loss_finite_and_grads_flow(tiny_setup):
    cfg, params, head = tiny_setup
    batch = _make_batch(cfg)
    kw = dict(temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type="grpo",
              importance_level="token", value_w=1.0, beta=0.0,
              max_completion_length=16, remat=False)
    (loss, metrics), grads = jax.value_and_grad(
        lambda ph: losses.loss_and_metrics(ph[0], ph[1], batch, cfg, **kw),
        has_aux=True)((params, head))
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0
    # on-policy: ratio==1 -> policy loss == -mean(A) over tokens per row... sign sanity
    assert np.isfinite(metrics["policy_loss"]) and np.isfinite(metrics["value_loss"])


def test_loss_types_differ(tiny_setup):
    cfg, params, head = tiny_setup
    batch = _make_batch(cfg)
    outs = {}
    for lt in ("grpo", "bnpo", "dr_grpo"):
        kw = dict(temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type=lt,
                  importance_level="token", value_w=0.0, beta=0.0,
                  max_completion_length=16, remat=False)
        loss, _ = losses.loss_and_metrics(params, head, batch, cfg, **kw)
        outs[lt] = float(loss)
    assert len({round(v, 8) for v in outs.values()}) >= 2


def test_kl_penalty_zero_when_ref_equals_policy(tiny_setup):
    cfg, params, head = tiny_setup
    batch = _make_batch(cfg)
    ref = losses.ref_logps_fn(params, batch, cfg, 1.0)
    kw = dict(temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type="grpo",
              importance_level="token", value_w=0.0, beta=0.1,
              max_completion_length=16, remat=False)
    _, metrics = losses.loss_and_metrics(params, head, batch, cfg, ref_logps=ref, **kw)
    assert abs(float(metrics["kl"])) < 1e-4


# ------------------------------------------------------------------- shaping

def _mk_chain_tree():
    """root -> a -> {b_correct(terminal), c_wrong(terminal)} as chains."""
    root = dict(completion="", current_depth=0, prompt_ids=[1], completion_ids=[],
                hid_idx=0, v_pred=0.5)
    a = dict(completion="STEP-1:\n<think>t</think>", current_depth=1,
             prompt_ids=[1], completion_ids=[2], hid_idx=1, v_pred=0.6)
    b = dict(completion="STEP-2:\n<think>u</think>\n<answer>4</answer>", current_depth=2,
             prompt_ids=[1, 2], completion_ids=[3], hid_idx=2, v_pred=0.9)
    c = dict(completion="STEP-2:\n<think>v</think>\n<answer>7</answer>", current_depth=2,
             prompt_ids=[1, 2], completion_ids=[4], hid_idx=3, v_pred=0.2)
    return root, [[a, b], [a, c]]


def test_compute_action_rewards_semantics():
    root, chains = _mk_chain_tree()
    bank = LatentBank()
    pts = np.array([[0.0, 0.0], [0.3, 0.0], [0.6, 0.0], [0.1, 0.5]], np.float32)
    for p in pts:
        bank.add(p)
    cfg = ShapingConfig(depth=3)
    reward = [lambda comp, gt: 1.0 if "<answer>4</answer>" in comp else 0.0]
    avg_acc, pass1, diag = compute_action_rewards(
        chains, reward, "4", cfg, bank=bank, root_step=root)

    a, b, c = chains[0][0], chains[0][1], chains[1][1]
    assert b["is_leaf"] and c["is_leaf"] and not a["is_leaf"]
    assert b["is_correct"] and not c["is_correct"]
    assert avg_acc == pytest.approx(0.5)
    assert a["on_path"] and b["on_path"] and not c["on_path"]
    # pass@1: max-v_pred answered leaf is b (0.9) which is correct
    assert pass1 == 1.0
    # V-map: b is an anchor -> d_goal ~0 -> V(b) ~1; root V ~0
    assert b["v_target"] > 0.9
    assert root["v_target"] < 0.05
    # edge reward of b positive (V increased along the path)
    assert b["reward"] > 0.0


def test_compute_action_rewards_dead_tree():
    root, chains = _mk_chain_tree()
    bank = LatentBank()
    for p in np.random.default_rng(0).normal(size=(4, 2)).astype(np.float32) * 0.1:
        bank.add(p)
    cfg = ShapingConfig(depth=3)
    reward = [lambda comp, gt: 0.0]  # nothing correct -> no anchors
    avg_acc, pass1, _ = compute_action_rewards(chains, reward, "4", cfg,
                                               bank=bank, root_step=root)
    assert avg_acc == 0.0 and pass1 == 0.0
    assert all(st["v_target"] == 0.0 for ch in chains for st in ch)


# ------------------------------------------------------------------- full step

def test_trainer_full_step_tiny():
    """End-to-end: fake-engine MCTS rollout -> shaping -> jitted update."""
    cfg = Qwen2Config.tiny(vocab_size=4096)
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    eng = FakeEngine(tok, script=[
        (r"STEP-2", ["done </think> <answer>4</answer>", "done2 </think> <answer>7</answer>"]),
        (r".", ["go </think> on", "go2 </think> on"]),
    ])

    args = MTPOConfig(
        output_dir="/tmp/lapha-train-test", model_name_or_path=None,
        depth=3, breadth=2, num_sim=6, num_pos_sim=99, prune_per=100,
        num_groups=4, max_model_len=512, max_prompt_length=256,
        max_completion_length=32, per_device_train_batch_size=2,
        num_generations=2, save_steps=0, bf16=False,
        gradient_checkpointing=False, mesh_model=1, debug_print=False,
    )

    from lapha_tpu.train.trainer import MTPOTrainer

    dataset = [
        {"question": "what is 2+2?", "ground_truth": "4", "support_material_path": [],
         "cot": "add two and two to get <answer>4</answer>"},
        {"question": "what is 1+3?", "ground_truth": "4", "support_material_path": []},
    ]
    trainer = MTPOTrainer(
        model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
        reward_fns=[lambda c, gt: 1.0 if f"<answer>{gt}</answer>" in c else 0.0],
        train_dataset=dataset, tokenizer=tok,
    )
    trainer.engine = eng  # fake generation; value_fn stays real (tiny model)

    m = trainer.train_step(dataset)
    assert trainer.global_step == 1
    assert m["n_samples"] >= 0
    if m["n_samples"] > 0:
        assert np.isfinite(m["loss"])
        assert m["num_groups"] >= 1
    # metrics jsonl written with reference scalar names (first tree has a
    # cot -> the d_goal anchor guarantees a V-map -> VMap/* present even if
    # no sampled leaf is correct; ContextLength written every update step)
    lines = [json.loads(l) for l in open(os.path.join(args.output_dir, "metrics.jsonl"))]
    names = {l["name"] for l in lines}
    assert "avgAcc" in names and "pass@1" in names
    assert "VMap/mean" in names and "VMap/std" in names
    if m["n_samples"] > 0:
        assert "Metrics/ContextLength" in names


def test_trainer_checkpoint_roundtrip(tmp_path):
    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    args = MTPOConfig(
        output_dir=str(tmp_path), model_name_or_path=None, depth=2, breadth=2,
        num_sim=2, max_model_len=256, num_generations=2, save_steps=0,
        bf16=False, gradient_checkpointing=False, debug_print=False,
    )
    from lapha_tpu.train.trainer import MTPOTrainer

    t1 = MTPOTrainer(model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
                     reward_fns=[], train_dataset=[], tokenizer=tok)
    t1.global_step = 7
    t1.save_checkpoint()

    t2 = MTPOTrainer(model=(qwen2.init_params(cfg, jax.random.key(9)), cfg),
                     agent_cls_list=[PoorAgent], args=args,
                     reward_fns=[], train_dataset=[], tokenizer=tok)
    assert t2.load_checkpoint()
    assert t2.global_step == 7
    np.testing.assert_allclose(np.asarray(t2.head["w"], np.float32),
                               np.asarray(t1.head["w"], np.float32))
    l1 = jax.tree.leaves(t1.params)
    l2 = jax.tree.leaves(t2.params)
    np.testing.assert_allclose(np.asarray(l1[0], np.float32),
                               np.asarray(l2[0], np.float32))


def test_checkpoint_resume_survives_stale_latest_pointer(tmp_path):
    """Async saves defer the `latest` pointer write until the checkpoint
    has durably landed; if the process dies between orbax's atomic commit
    and the pointer write, resume must still pick the newest FINALIZED
    step_* dir rather than the stale pointer."""
    import os

    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    args = MTPOConfig(
        output_dir=str(tmp_path), model_name_or_path=None, depth=2, breadth=2,
        num_sim=2, max_model_len=256, num_generations=2, save_steps=0,
        bf16=False, gradient_checkpointing=False, debug_print=False,
    )
    from lapha_tpu.train.trainer import MTPOTrainer

    t1 = MTPOTrainer(model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
                     reward_fns=[], train_dataset=[], tokenizer=tok)
    t1.global_step = 3
    t1.save_checkpoint()
    t1.global_step = 9
    t1.save_checkpoint()
    t1.finish_pending_saves()
    # simulate the crash window: pointer regressed to the older checkpoint
    with open(os.path.join(str(tmp_path), "checkpoints", "latest"), "w") as f:
        f.write("3")

    t2 = MTPOTrainer(model=(qwen2.init_params(cfg, jax.random.key(9)), cfg),
                     agent_cls_list=[PoorAgent], args=args,
                     reward_fns=[], train_dataset=[], tokenizer=tok)
    assert t2.load_checkpoint()
    assert t2.global_step == 9


def test_self_evolving_judge_reward():
    """Policy-as-judge: 0 without tag / gt-substring; 0.8 exact; judge call
    on substring-but-not-exact (reference mtpo_trainer.py:3148-3205)."""
    from lapha_tpu.models import Qwen2Config as QC, qwen2 as q2
    from lapha_tpu.train.trainer import MTPOTrainer

    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    args = MTPOConfig(output_dir="/tmp/lapha-judge-test", model_name_or_path=None,
                      depth=2, breadth=2, num_sim=2, max_model_len=256,
                      num_generations=2, save_steps=0, bf16=False,
                      gradient_checkpointing=False, debug_print=False)
    t = MTPOTrainer(model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
                    reward_fns=[], train_dataset=[], tokenizer=tok)
    # self_evolving appended automatically
    assert t.reward_fns and t.reward_fns[-1] == t.self_evolving
    assert t.self_evolving("no tag", "4") == 0.0
    assert t.self_evolving("<answer>5</answer>", "4") == 0.0
    assert t.self_evolving("<answer>4</answer>", "4") == 0.8
    # substring-not-exact escalates to the judge engine
    t.question = "What is 2+2? 👆 fmt"
    t.engine = FakeEngine(tok, script=[(r".", ["<answer>1</answer>"])])
    assert t.self_evolving("<answer>the result is 4</answer>", "4") == 1.0
    t.engine = FakeEngine(tok, script=[(r".", ["<answer>0</answer>"])])
    assert t.self_evolving("<answer>the result is 4</answer>", "4") == 0.0


def test_all_nodes_mse_mode(tmp_path):
    """num_trees != -1: value MSE over all tree nodes feeds the update."""
    cfg = Qwen2Config.tiny(vocab_size=4096)
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    eng = FakeEngine(tok, script=[
        (r"STEP-2", ["done </think> <answer>4</answer>", "done2 </think> <answer>7</answer>"]),
        (r".", ["go </think> on", "go2 </think> on"]),
    ])
    args = MTPOConfig(
        output_dir=str(tmp_path), model_name_or_path=None,
        depth=3, breadth=2, num_sim=6, num_pos_sim=99, prune_per=100,
        num_groups=4, max_model_len=512, max_prompt_length=256,
        max_completion_length=32, per_device_train_batch_size=2,
        num_generations=2, save_steps=0, bf16=False,
        gradient_checkpointing=False, debug_print=False,
        num_trees=2, mse_micro_bs=4,
    )
    from lapha_tpu.train.trainer import MTPOTrainer

    dataset = [
        {"question": "what is 2+2?", "ground_truth": "4", "support_material_path": []},
        {"question": "what is 1+3?", "ground_truth": "4", "support_material_path": []},
    ]
    trainer = MTPOTrainer(
        model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
        reward_fns=[lambda c, gt: 1.0 if f"<answer>{gt}</answer>" in c else 0.0],
        train_dataset=dataset, tokenizer=tok,
    )
    trainer.engine = eng
    m = trainer.train_step(dataset)
    assert trainer.global_step == 1
    if m.get("n_samples", 0) > 0:
        assert "value_loss_all_nodes" in m
        assert np.isfinite(m["value_loss_all_nodes"])
        assert np.isfinite(m["loss"])


def test_ensure_hid_idx_coverage(tmp_path):
    from lapha_tpu.train.trainer import MTPOTrainer

    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    args = MTPOConfig(output_dir=str(tmp_path), model_name_or_path=None,
                      depth=2, breadth=2, num_sim=2, max_model_len=256,
                      num_generations=2, save_steps=0, bf16=False,
                      gradient_checkpointing=False, debug_print=False)
    t = MTPOTrainer(model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
                    reward_fns=[], train_dataset=[], tokenizer=tok)
    bank = LatentBank()
    covered = dict(prompt_ids=[3, 4], completion_ids=[5], hid_idx=bank.add(np.zeros(cfg.hidden_size)))
    missing = dict(prompt_ids=[3, 4], completion_ids=[6, 7])
    empty = dict(prompt_ids=[3], completion_ids=[])  # cannot embed; stays None
    n = t._ensure_hid_idx_coverage([[covered, missing], [empty]], bank)
    assert n == 1
    assert missing["hid_idx"] is not None
    assert isinstance(missing["hid"], list)
    assert "hid_idx" not in empty or empty.get("hid_idx") is None


def test_gradient_accumulation_multisteps():
    """gradient_accumulation_steps=2 (optax.MultiSteps): params move only
    every 2nd update call (HF Trainer accumulation semantics)."""
    cfg = Qwen2Config.tiny(vocab_size=4096)
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    args = MTPOConfig(
        output_dir="/tmp/lapha-gas-test", model_name_or_path=None,
        depth=3, breadth=2, num_sim=6, num_pos_sim=99, prune_per=100,
        num_groups=4, max_model_len=512, max_prompt_length=256,
        max_completion_length=32, per_device_train_batch_size=2,
        num_generations=2, save_steps=0, bf16=False,
        gradient_checkpointing=False, mesh_model=1, debug_print=False,
        gradient_accumulation_steps=2,
    )
    from lapha_tpu.train.trainer import MTPOTrainer

    trainer = MTPOTrainer(
        model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
        reward_fns=[lambda c, gt: 1.0], train_dataset=[], tokenizer=tok,
    )
    rng_l = np.random.default_rng(0)
    samples = [dict(prompt_ids=rng_l.integers(2, cfg.vocab_size, 8).tolist(),
                    completion_ids=rng_l.integers(2, cfg.vocab_size, 6).tolist())
               for _ in range(4)]
    from lapha_tpu.train import losses as _losses

    packed = _losses.pack_samples(samples, pad_id=0, eos_id=1,
                                  max_prompt_length=64, pad_multiple=16,
                                  batch_multiple=1)
    packed.pop("kept")
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = packed["ids"].shape[0]
    batch["advantages"] = jnp.asarray(rng_l.normal(size=Bb).astype(np.float32))
    batch["v_target"] = jnp.asarray(rng_l.uniform(size=Bb).astype(np.float32))

    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)

    def step_and_diff():
        with trainer.mesh:
            trainer.params, trainer.head, trainer.opt_state, _ = trainer._update(
                trainer.params, trainer.head, trainer.opt_state, batch, None)
        return sum(float(np.abs(np.asarray(b) - a).sum())
                   for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(trainer.params)))

    # warmup schedule gives lr=0 at optimizer-step 0, so the first APPLY
    # (call 2) is a deliberate no-op; movement appears at the second apply
    d1, d2, d3, d4 = (step_and_diff() for _ in range(4))
    assert d1 == 0.0, "params must not move on the first accumulation step"
    assert d3 == d2, "params must not move mid-accumulation"
    assert d4 > 0.0, "params must move at the second optimizer application"


def test_multi_epoch_ppo_clip_live():
    """num_iterations>1: with cached old_logps the PPO ratio departs from 1
    on the second epoch (the clip is live), and the update stays finite.
    The reference defines the knob but never uses it (mtpo_config.py:522
    vs mtpo_trainer.py:2370 detach); here it is functional."""
    cfg = Qwen2Config.tiny(vocab_size=512)
    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))

    rng_l = np.random.default_rng(3)
    samples = [dict(prompt_ids=rng_l.integers(2, cfg.vocab_size, 6).tolist(),
                    completion_ids=rng_l.integers(2, cfg.vocab_size, 5).tolist())
               for _ in range(4)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1, max_prompt_length=32,
                                 pad_multiple=16, batch_multiple=1)
    packed.pop("kept")
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = packed["ids"].shape[0]
    batch["advantages"] = jnp.asarray(rng_l.normal(size=Bb).astype(np.float32))
    batch["v_target"] = jnp.asarray(rng_l.uniform(size=Bb).astype(np.float32))

    kw = dict(temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type="grpo",
              importance_level="token", value_w=1.0, beta=0.0,
              max_completion_length=8, remat=False)

    old = losses.ref_logps_fn(params, batch, cfg, 1.0)

    # epoch 1: old == current policy -> identical loss to on-policy
    l_on, _ = losses.loss_and_metrics(params, head, batch, cfg, **kw)
    l_e1, _ = losses.loss_and_metrics(params, head, batch, cfg, old_logps=old, **kw)
    np.testing.assert_allclose(float(l_e1), float(l_on), rtol=1e-6)

    # move the params (one sgd-ish nudge), then epoch 2 must differ from
    # the on-policy loss at the SAME params (ratio != 1)
    g = jax.grad(lambda ph: losses.loss_and_metrics(ph[0], ph[1], batch, cfg, **kw)[0])(
        (params, head))
    params2 = jax.tree.map(lambda p, gr: p - 0.05 * gr.astype(p.dtype), params, g[0])
    l2_on, _ = losses.loss_and_metrics(params2, head, batch, cfg, **kw)
    l2_e2, m2 = losses.loss_and_metrics(params2, head, batch, cfg, old_logps=old, **kw)
    assert abs(float(l2_e2) - float(l2_on)) > 1e-6, "old_logps had no effect"
    assert np.isfinite(float(l2_e2))


def test_trainer_num_iterations_runs():
    cfg = Qwen2Config.tiny(vocab_size=512)
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    args = MTPOConfig(
        output_dir="/tmp/lapha-mi-test", depth=2, breadth=2, num_sim=2,
        num_pos_sim=99, prune_per=100, num_groups=2, max_model_len=256,
        max_prompt_length=128, max_completion_length=16,
        per_device_train_batch_size=1, num_generations=2, save_steps=0,
        bf16=False, gradient_checkpointing=False, mesh_model=1,
        debug_print=False, num_iterations=2,
    )
    from lapha_tpu.train.trainer import MTPOTrainer

    trainer = MTPOTrainer(model=(params, cfg), agent_cls_list=[PoorAgent],
                          args=args, reward_fns=[lambda c, gt: 1.0],
                          train_dataset=[], tokenizer=tok)
    rng_l = np.random.default_rng(0)
    samples = [dict(prompt_ids=rng_l.integers(2, cfg.vocab_size, 8).tolist(),
                    completion_ids=rng_l.integers(2, cfg.vocab_size, 6).tolist())
               for _ in range(4)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1,
                                 max_prompt_length=64, pad_multiple=16,
                                 batch_multiple=1)
    packed.pop("kept")
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = packed["ids"].shape[0]
    batch["advantages"] = jnp.asarray(rng_l.normal(size=Bb).astype(np.float32))
    batch["v_target"] = jnp.asarray(rng_l.uniform(size=Bb).astype(np.float32))
    old = losses.ref_logps_fn(trainer.params, batch, cfg, args.temperature)
    with trainer.mesh:
        for _ in range(args.num_iterations):
            trainer.params, trainer.head, trainer.opt_state, m = trainer._update(
                trainer.params, trainer.head, trainer.opt_state, batch, None,
                None, old_logps=old)
    assert np.isfinite(float(m["loss"]))


def test_engine_knobs_reach_rollout_engine():
    """MTPOConfig.engine_{kv_quant,spec_decode,spec_k} configure the
    trainer's rollout engine (round-3 serving levers)."""
    cfg = Qwen2Config.tiny(vocab_size=512)
    params = qwen2.init_params(cfg, jax.random.key(0))
    args = MTPOConfig(
        output_dir="/tmp/lapha-knobs-test", model_name_or_path=None,
        depth=2, breadth=2, num_sim=2, max_model_len=256,
        per_device_train_batch_size=1, num_generations=2, save_steps=0,
        bf16=False, gradient_checkpointing=False, mesh_model=1,
        debug_print=False, engine_spec_decode="pld", engine_spec_k=2,
    )
    from lapha_tpu.train.trainer import MTPOTrainer

    tr = MTPOTrainer(model=(params, cfg), agent_cls_list=[PoorAgent],
                     args=args, reward_fns=[lambda c, g: 0.0],
                     train_dataset=[], tokenizer=ChatTok())
    assert tr.engine.spec_decode == "pld" and tr.engine.spec_k == 2
    assert tr.engine.kv_quant is None


def test_trainer_rejects_quantized_params():
    """Quantized checkpoints are a serving artifact: the trainer must
    reject them loudly (reference trains bf16, lapha.yaml; vLLM serves
    quantized — the split is explicit, not silent)."""
    from lapha_tpu.models.quant import quantize_params
    from lapha_tpu.train.trainer import MTPOTrainer

    cfg = Qwen2Config.tiny(vocab_size=512)
    qp = quantize_params(qwen2.init_params(cfg, jax.random.key(0)))
    args = MTPOConfig(
        output_dir="/tmp/lapha-quant-reject-test", model_name_or_path=None,
        depth=2, breadth=2, num_sim=2, max_model_len=256,
        per_device_train_batch_size=1, num_generations=2, save_steps=0,
        bf16=False, gradient_checkpointing=False, mesh_model=1,
        debug_print=False,
    )
    with pytest.raises(ValueError, match="quantized"):
        MTPOTrainer(model=(qp, cfg), agent_cls_list=[PoorAgent],
                    args=args, reward_fns=[lambda c, g: 0.0],
                    train_dataset=[], tokenizer=ChatTok())


@pytest.mark.parametrize("pol", [True, "save_qkv", "save_attn",
                                 "save_qkv_attn"])
def test_remat_policy_update_matches_no_remat(pol):
    """Remat policies change memory/recompute scheduling, never values:
    one update step under each named policy == the no-remat update."""
    import optax

    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    rng = np.random.default_rng(0)
    samples = [dict(prompt_ids=rng.integers(2, cfg.vocab_size, 9).tolist(),
                    completion_ids=rng.integers(2, cfg.vocab_size, 7).tolist())
               for _ in range(4)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1,
                                 max_prompt_length=32, pad_multiple=16,
                                 batch_multiple=2)
    packed.pop("kept")
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    B = batch["ids"].shape[0]
    batch["advantages"] = jnp.asarray(rng.normal(size=B).astype(np.float32))
    batch["v_target"] = jnp.asarray(rng.uniform(size=B).astype(np.float32))
    opt = optax.sgd(1e-3)

    def run(remat):
        kw = dict(temperature=1.0, eps_low=0.2, eps_high=0.2,
                  loss_type="grpo", importance_level="token", value_w=1.0,
                  beta=0.0, max_completion_length=8, remat=remat)
        upd = losses.make_update_fn(cfg, opt, loss_kwargs=kw)
        p, h = jax.tree.map(jnp.array, (params, head))
        p2, h2, _, m = upd(p, h, opt.init((p, h)), batch, None)
        return float(m["loss"]), jax.tree.leaves((p2, h2))

    l_ref, w_ref = run(False)
    l_pol, w_pol = run(pol)
    assert abs(l_pol - l_ref) < 1e-5
    for a, b in zip(w_pol, w_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-4)


def test_remat_policy_rejects_unknown():
    with pytest.raises(ValueError, match="remat policy"):
        qwen2.remat_policy("save_everything")


def test_rejection_observability_on_filtered_step():
    """A step where every tree is filtered must say WHY (round-5 item 4).

    With a constant reward fn there is no reward signal anywhere, so every
    tree is rejected before grouping (this config trips the all-zero
    v_target filter). Run-3 logged such steps as bare 'loss=0'; now the
    metrics carry per-filter rejection counts and an explicit skipped
    marker, and every fired counter lands in metrics.jsonl as a named
    Rollout/rej_* scalar.
    """
    cfg = Qwen2Config.tiny(vocab_size=4096)
    params = qwen2.init_params(cfg, jax.random.key(0))
    tok = ChatTok()
    eng = FakeEngine(tok, script=[
        (r"STEP-2", ["done </think> <answer>4</answer>"]),
        (r".", ["go </think> on"]),
    ])
    args = MTPOConfig(
        output_dir="/tmp/lapha-train-rej-test", model_name_or_path=None,
        depth=3, breadth=2, num_sim=4, num_pos_sim=99, prune_per=100,
        num_groups=4, max_model_len=512, max_prompt_length=256,
        max_completion_length=32, per_device_train_batch_size=2,
        num_generations=2, save_steps=0, bf16=False,
        gradient_checkpointing=False, mesh_model=1, debug_print=False,
        num_trees=-1,
    )
    from lapha_tpu.train.trainer import MTPOTrainer

    dataset = [{"question": "what is 2+2?", "ground_truth": "4",
                "support_material_path": []}]
    trainer = MTPOTrainer(
        model=(params, cfg), agent_cls_list=[PoorAgent], args=args,
        reward_fns=[lambda c, gt: 1.0],  # everything correct -> avgAcc=1
        train_dataset=dataset, tokenizer=tok,
    )
    trainer.engine = eng
    m = trainer.train_step(dataset)
    assert m["loss"] == 0.0 and m["n_samples"] == 0
    assert m["skipped"] == "no_trainable_groups"
    fired = {k: v for k, v in m.items() if k.startswith("rej_") and v}
    assert fired, "a fully-filtered step must name at least one filter"
    assert m.get("rej_trees_no_v_signal", 0) >= 1  # this config's filter
    # the named scalars landed in metrics.jsonl too
    lines = [json.loads(l) for l in
             open(os.path.join(args.output_dir, "metrics.jsonl"))]
    names = {l["name"] for l in lines}
    for k in fired:
        assert f"Rollout/{k}" in names
