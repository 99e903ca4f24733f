"""MTPOTrainer: MCTS rollouts + hyperbolic shaping + GRPO/value update.

Capability parity with /root/reference/trainer/mtpo_trainer.py MTPOTrainer
(rollout loop + group building 1491-1837, update 1874-2446, metrics/TB
3207-3217, per-step sample dumps 1795-1837) — redesigned for one-process
SPMD:

- generation, value scoring and the update share ONE set of mesh-sharded
  arrays: there is no weight-sync plane (reference NCCL gather+broadcast,
  880-953), no rank0 scatter protocol (955-1294), no STOP/STEPS broadcasts
  (1770-1868) — the engine reads the training params directly and
  ``engine.update_params(params)`` after each step is a pointer swap,
- the policy+value update is one jitted step over the (data, model) mesh
  (losses.make_update_fn),
- checkpointing via orbax {params, head, opt_state, step}; resume picks the
  latest step; tensorboard metrics keep the reference scalar names.
"""

from __future__ import annotations

import json
import os
import random
import re
import time
from collections import defaultdict
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.adapter import SamplingParams
from ..engine.engine import Engine
from ..models import value_model
from ..parallel import make_mesh, shard_params
from ..search import LatentBank
from ..search.value_fn import ValueFunction
from . import losses
from .config import MTPOConfig
from .shaping import ShapingConfig, best_var_window_constrained, compute_action_rewards, has_answer


class MetricsWriter:
    """JSONL metrics + optional TensorBoard (torch SummaryWriter if present),
    with the reference's scalar names."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, name: str, value: float, step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, "name": name, "value": float(value)}) + "\n")
        if self.tb is not None:
            self.tb.add_scalar(name, float(value), step)


# One async orbax checkpointer per PROCESS (not per trainer): any trainer's
# flush then covers every in-flight save, so save-in-one-object /
# load-in-another (tests, tooling) stays coherent. "pending" remembers the
# (ckpt_dir, step) whose `latest` pointer write is deferred until the save
# has durably landed.
_ASYNC_CKPT: dict = {"ckptr": None, "pending": None}


def _finish_pending_saves():
    ck = _ASYNC_CKPT["ckptr"]
    if ck is None:
        return
    ck.wait_until_finished()
    if _ASYNC_CKPT["pending"] is not None:
        ckpt_dir, step = _ASYNC_CKPT["pending"]
        with open(os.path.join(ckpt_dir, "latest"), "w") as f:
            f.write(str(step))
        _ASYNC_CKPT["pending"] = None


class MTPOTrainer:
    def __init__(
        self,
        model: str | tuple,
        agent_cls_list: Sequence[type],
        args: MTPOConfig,
        reward_fns: Sequence[Callable],
        train_dataset,
        eval_dataset=None,
        tokenizer=None,
        mesh=None,
    ):
        self.args = args
        self.agent_cls_list = list(agent_cls_list)
        self.reward_fns = list(reward_fns)
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset

        # ---- model + tokenizer ----
        if isinstance(model, str):
            from transformers import AutoTokenizer

            from ..models import loader

            self.params, self.model_cfg = loader.load_params(
                model, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
            if tokenizer is None:
                tokenizer = AutoTokenizer.from_pretrained(model, trust_remote_code=True)
                if tokenizer.pad_token is None:
                    tokenizer.pad_token = tokenizer.eos_token
        else:
            self.params, self.model_cfg = model
        # Quantized checkpoints are a SERVING artifact, not a training one:
        # the reference trains bf16 (lapha.yaml bf16: true) while vLLM
        # serves quantized — we keep that split explicit. int8/int4 leaves
        # ({q, scale[, offset]} dicts) cannot take gradients and straight-
        # through training on RTN-rounded weights would silently degrade,
        # so reject loudly instead of auto-dequantizing a lossy artifact.
        from ..models.quant import is_quantized

        quant_leaves = [
            jax.tree_util.keystr(path)
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                self.params, is_leaf=is_quantized)
            if is_quantized(leaf)
        ]
        if quant_leaves:
            raise ValueError(
                "MTPOTrainer requires full-precision parameters; got "
                f"{len(quant_leaves)} quantized leaves (first: "
                f"{quant_leaves[0]}). Quantized params are for SERVING "
                "(Engine / load_params(quantize=...)). To train, reload "
                "the checkpoint with quantize=None; quantization is lossy "
                "(RTN), so dequantizing it back is a strictly worse "
                "starting point than the original bf16 weights.")
        self.tokenizer = tokenizer
        self.head = value_model.make_value_head(
            args.value_head_type, self.model_cfg.hidden_size, jax.random.key(args.seed))

        # ---- mesh + sharding ----
        n_model = max(1, args.mesh_model)
        n_seq = max(1, args.mesh_sequence)
        n_data = args.mesh_data if args.mesh_data > 0 else None
        self.mesh = mesh or make_mesh(n_data, n_model, n_seq)
        self.params = shard_params(self.params, self.mesh)

        # ---- engine + value fn share the training arrays ----
        pad_mult = min(128, args.max_model_len)
        self.engine = Engine(
            self.params, self.model_cfg, self.tokenizer,
            max_model_len=args.max_model_len,
            max_batch=max(args.breadth * max(1, args.leaves_per_sim), 8),
            pad_multiple=pad_mult,
            seed=args.seed,
            collect_h0=True,  # fused value scoring during rollouts
            kv_quant=args.engine_kv_quant,
            spec_decode=args.engine_spec_decode,
            spec_k=args.engine_spec_k,
        )
        self.value_fn = ValueFunction(
            self.params, self.head, self.model_cfg,
            max_model_len=args.max_model_len, pad_multiple=pad_mult,
            no_head_scale=args.no_head_scale, curvature=args.curvature,
            value_activation=args.value_activation, mesh=self.mesh,
        )

        # ---- optimizer ----
        total_steps = args.max_steps if args.max_steps > 0 else 1000
        warmup = max(1, int(args.warmup_ratio * total_steps))

        def build_optimizer():
            if args.lr_scheduler_type == "cosine":
                sched = optax.warmup_cosine_decay_schedule(
                    0.0, args.learning_rate, warmup,
                    max(total_steps, warmup + 1))
            elif args.lr_scheduler_type == "linear":
                # transformers-style: warmup to lr, linear decay to 0
                sched = optax.join_schedules(
                    [optax.linear_schedule(0.0, args.learning_rate, warmup),
                     optax.linear_schedule(args.learning_rate, 0.0,
                                           max(1, total_steps - warmup))],
                    [warmup])
            else:  # "constant" and anything else: flat lr after warmup
                sched = optax.join_schedules(
                    [optax.linear_schedule(0.0, args.learning_rate, warmup),
                     optax.constant_schedule(args.learning_rate)],
                    [warmup])
            opt = optax.chain(
                optax.clip_by_global_norm(args.max_grad_norm),
                optax.scale_by_adam(b1=args.adam_beta1, b2=args.adam_beta2,
                                    mu_dtype=jnp.float32),
                optax.add_decayed_weights(args.weight_decay)
                if args.weight_decay > 0 else optax.identity(),
                optax.scale_by_learning_rate(sched),
            )
            if args.gradient_accumulation_steps > 1:
                # HF-Trainer semantics: each train_step (one rollout batch)
                # contributes grads; the optimizer applies every N steps
                opt = optax.MultiSteps(
                    opt, every_k_schedule=args.gradient_accumulation_steps)
            return opt

        # every scalar the optimizer factory closes over — the memo key
        # (losses.make_update_fn_cached) so equal-config trainers share
        # one compiled update step
        opt_key = (args.learning_rate, args.lr_scheduler_type, total_steps,
                   warmup, args.max_grad_norm, args.adam_beta1,
                   args.adam_beta2, args.weight_decay,
                   args.gradient_accumulation_steps)
        self.optimizer, self._update = losses.make_update_fn_cached(
            self.model_cfg, build_optimizer, opt_key=opt_key,
            loss_kwargs=dict(
                temperature=args.temperature,
                eps_low=args.epsilon, eps_high=args.epsilon_high,
                loss_type=args.loss_type,
                importance_level=args.importance_sampling_level,
                value_w=args.value_w, beta=args.beta,
                max_completion_length=args.max_completion_length,
                no_head_scale=args.no_head_scale,
                value_activation=args.value_activation,
                remat=(args.remat_policy if args.gradient_checkpointing
                       else False),
                attn_impl=args.attn_implementation,
                # mesh_sequence > 1: LM forward rides the ring-attention
                # sequence axis of the 3-axis mesh (context parallelism)
                seq_mesh=(self.mesh if "sequence" in self.mesh.shape
                          and self.mesh.shape["sequence"] > 1 else None),
            ),
        )
        self.opt_state = self.optimizer.init((self.params, self.head))
        self.ref_params = None  # set lazily if beta > 0
        self._value_sumsq_grad = losses.make_value_sumsq_grad_fn(
            self.model_cfg, no_head_scale=args.no_head_scale,
            value_activation=args.value_activation,
            remat=(args.remat_policy if args.gradient_checkpointing
                   else False),
            attn_impl=args.attn_implementation,
            seq_mesh=(self.mesh if "sequence" in self.mesh.shape
                      and self.mesh.shape["sequence"] > 1 else None))

        self.sampling_params = SamplingParams(
            n=args.breadth, temperature=args.temperature, top_p=args.top_p,
            top_k=args.top_k, min_p=args.min_p,
            repetition_penalty=args.repetition_penalty,
            max_tokens=args.max_completion_length,
        )
        self.shaping_cfg = ShapingConfig(
            depth=args.depth, passk_threshold=args.passk_threshold,
            curvature=args.curvature, adaptive_fmt_bonus=args.adaptive_fmt_bonus,
            adapt_alpha_fmt=args.adapt_alpha_fmt, adapt_alpha_dv=args.adapt_alpha_dv,
            adapt_eps=args.adapt_eps, adapt_min_weight=args.adapt_min_weight,
            adapt_dv_var_eps=args.adapt_dv_var_eps,
            adapt_dv_sum_eps=args.adapt_dv_sum_eps,
            max_prompt_length=args.max_prompt_length,
        )

        self.global_step = 0
        self.rng = random.Random(args.seed)
        self.writer = MetricsWriter(args.output_dir)
        self._metrics: dict[str, list] = defaultdict(list)
        os.makedirs(args.output_dir, exist_ok=True)
        self.question: str | None = None  # current rollout question (judge context)
        # self-judge appended to reward_fns like the reference
        # (mtpo_trainer.py:804, 3148-3205); the 0.8 exact-match score is
        # deliberately below passk_threshold so max-composition with the
        # rule reward shadows it unless only the judge fires (SURVEY §7.4)
        self.reward_fns.append(self.self_evolving)

    # ------------------------------------------------------------- self judge

    def self_evolving(self, model_output: str, ground_truth) -> float:
        """Policy-as-judge fallback reward (reference mtpo_trainer.py:3148)."""
        import re as _re

        matches = _re.findall(r"<answer>(.*?)</answer>", model_output or "")
        if not matches:
            return 0.0
        extracted = matches[-1]
        if str(ground_truth) not in extracted:
            return 0.0
        if str(ground_truth) == extracted:
            return 0.8
        prompt_body = (self.question or "").split("👆")[0]
        prompt = (
            "Evaluate the model's answer against the human-annotated ground truth.\n\n"
            "## Instructions\n"
            "1. Return a correctness score **either 0 or 1** (1 represents "
            "model_output == ground_truth).\n"
            "3. Wrap **only** the final score in `<answer>…</answer>`.\n\n"
            f"## Query\n{prompt_body}\n\n"
            f"## Model Output\n{extracted}\n\n"
            f"## Ground Truth\n{ground_truth}"
        )
        try:
            chat = self.tokenizer.apply_chat_template(
                conversation=[{"role": "user", "content": prompt}],
                tokenize=False, add_generation_prompt=True)
            import copy as _copy

            sp = _copy.copy(self.sampling_params)
            sp.n = 1
            out = self.engine.generate(prompts=[chat], sampling_params=sp, use_tqdm=False)
            text = self.tokenizer.decode(list(out[0].outputs[0].token_ids),
                                         skip_special_tokens=True)
            verdict = _re.findall(r"<answer>(.*?)</answer>", text)
            return 1.0 if verdict and float(verdict[-1]) == 1.0 else 0.0
        except Exception:
            return 0.0

    # ------------------------------------------------------------- rollout

    def _make_agent(self, hid_bank: LatentBank):
        cls = self.rng.choice(self.agent_cls_list)
        agent = cls(
            tokenizer=self.tokenizer, depth=self.args.depth, breadth=self.args.breadth,
            output_dir=self.args.output_dir, llm=self.engine,
            max_model_len=self.args.max_model_len, sampling_params=self.sampling_params,
            value_fn=self.value_fn, reward_fns=self.reward_fns,
            c_puct=self.args.c_puct, v_prior=self.args.v_prior,
            value_trust=self.args.value_trust, num_sim=self.args.num_sim,
            prune_per=self.args.prune_per, max_expands=self.args.max_expands,
            num_pos_sim=self.args.num_pos_sim,
            passk_threshold=self.args.passk_threshold,
            leaves_per_sim=self.args.leaves_per_sim,
            hid_bank=hid_bank, rng=self.rng,
        )
        return agent

    def _ensure_hid_idx_coverage(self, chains, hid_bank, root_step=None,
                                 batch_size: int = 8) -> int:
        """Embed any steps missing a latent-bank row before shaping
        (reference mtpo_trainer.py:1329-1444): nodes whose value batch was
        skipped during search (e.g. transiently disabled rows) still need a
        ball point for the V-map. Returns the number embedded."""
        missing = []
        seen = set()
        for chain in chains:
            for st in chain:
                if id(st) in seen or st.get("hid_idx") is not None:
                    continue
                seen.add(id(st))
                p_ids = st.get("prompt_ids")
                c_ids = st.get("completion_ids")
                if not p_ids or not c_ids:
                    continue
                missing.append(st)
        if not missing:
            return 0
        root_h0 = None
        if root_step is not None and root_step.get("root_h0") is not None:
            root_h0 = np.asarray(root_step["root_h0"], np.float32).reshape(-1)
        for lo in range(0, len(missing), batch_size):
            chunk = missing[lo:lo + batch_size]
            L = max(len(st["prompt_ids"]) + len(st["completion_ids"]) for st in chunk)
            ids = np.zeros((len(chunk), L), np.int64)
            attn = np.zeros_like(ids)
            resp = np.zeros_like(ids)
            pm = np.zeros_like(ids)
            for i, st in enumerate(chunk):
                pl_, cl_ = len(st["prompt_ids"]), len(st["completion_ids"])
                ids[i, :pl_] = st["prompt_ids"]
                ids[i, pl_:pl_ + cl_] = st["completion_ids"]
                attn[i, :pl_ + cl_] = 1
                resp[i, pl_:pl_ + cl_] = 1
                pm[i, :pl_] = 1
            y, _v = self.value_fn(input_ids=ids, attention_mask=attn,
                                  response_mask=resp, prompt_mask=pm,
                                  root_h0=root_h0, return_h0=False)
            for i, st in enumerate(chunk):
                st["hid_idx"] = hid_bank.add(np.asarray(y[i], np.float32))
                st["hid"] = np.asarray(y[i], np.float16).tolist()
        return len(missing)

    def _embed_cot_anchor(self, cot, root_step) -> Optional[np.ndarray]:
        """Embed the dataset's reference CoT as an extra "correct leaf"
        anchor for d_goal (reference mtpo_trainer.py:2506-2518, 2788-2811):
        tokenize it (str) or accept pre-tokenized ids, append EOS so the
        trace looks finish-like, left-truncate prompt||cot to max_model_len
        with completion-pooling masks, and run value_fn with the root
        centering. Returns (1, H) float32 ball point or None."""
        if cot is None or root_step is None:
            return None
        p_ids = root_step.get("prompt_ids")
        if not p_ids:
            return None
        if isinstance(cot, str):
            c_ids = [int(t) for t in
                     self.tokenizer(cot, add_special_tokens=False)["input_ids"]]
        else:
            c_ids = [int(t) for t in cot]
        eos_id = getattr(self.tokenizer, "eos_token_id", None)
        if eos_id is not None and (not c_ids or c_ids[-1] != int(eos_id)):
            c_ids.append(int(eos_id))
        if not c_ids:
            return None
        p_ids = [int(t) for t in p_ids]
        full = p_ids + c_ids
        resp = [0] * len(p_ids) + [1] * len(c_ids)
        pm = [1] * len(p_ids) + [0] * len(c_ids)
        mx = int(self.args.max_model_len or 0)
        if mx > 0 and len(full) > mx:
            full, resp, pm = full[-mx:], resp[-mx:], pm[-mx:]
        ids = np.asarray([full], np.int64)
        root_h0 = None
        if root_step.get("root_h0") is not None:
            root_h0 = np.asarray(root_step["root_h0"], np.float32).reshape(-1)
        y, _v = self.value_fn(input_ids=ids, attention_mask=np.ones_like(ids),
                              response_mask=np.asarray([resp], np.int64),
                              prompt_mask=np.asarray([pm], np.int64),
                              root_h0=root_h0, return_h0=False)
        return np.asarray(y, np.float32).reshape(1, -1)

    def rollout_batch(self, inputs: list[dict]) -> dict:
        """MCTS per question -> shaped rewards -> grouped training samples.

        Group building parity (mtpo_trainer.py:1611-1763): skip all-zero
        v_target trees and avgAcc>=0.8 trees; bucket by prompt_ids; require
        >= breadth samples, reward variance, positive v_target; pick the
        best-variance window of size breadth; <=2 groups/tree; stop at
        num_groups.
        """
        args = self.args
        eps_reward, eps_vt = 1e-12, 1e-8
        # rejection-reason counters (round-5 observability): the reference
        # applies the same filters silently inside its group loop
        # (mtpo_trainer.py:1611-1763) — a step that trains on nothing logs
        # bare loss=0 with no trace of WHICH filter fired. Count every
        # rejection so degenerate steps are explainable at a glance.
        rej = dict(trees_no_v_signal=0, trees_no_samples=0,
                   trees_high_acc=0, buckets_small=0,
                   buckets_no_reward_var=0, buckets_no_pos_v_target=0)
        step_samples: list[dict] = []
        mse_nodes: list[dict] = []
        avg_accs, pass1s = [], []
        group_count = 0
        mse_tree_cnt = 0
        viz_payload = []

        for idx, inp in enumerate(inputs):
            if group_count >= args.num_groups:
                break
            self.question = inp["question"]
            hid_bank = LatentBank()
            agent = self._make_agent(hid_bank)
            chains = agent.search(
                question=inp["question"],
                support_material_path=inp.get("support_material_path"),
                ground_truth=inp["ground_truth"],
                # search gets no CoT (reference call site mtpo_trainer.py:
                # 1581-1586, SURVEY §7.4); shaping gets it as a d_goal
                # anchor below (reference 1603, 2788-2811)
                cot=None,
            )
            self._ensure_hid_idx_coverage(chains, hid_bank,
                                           root_step=agent._root_step)
            cot_anchor = self._embed_cot_anchor(inp.get("cot"), agent._root_step)
            avg_acc, pass1, diag = compute_action_rewards(
                chains, self.reward_fns, inp["ground_truth"], self.shaping_cfg,
                bank=hid_bank, root_step=agent._root_step,
                cot_anchor=cot_anchor)
            if "vmap_mean" in diag:
                # per-tree at the same step, exactly like the reference
                # (mtpo_trainer.py:2833-2838 writes inside its per-tree
                # loop): TensorBoard keeps the LAST tree's value for the
                # step; metrics.jsonl keeps every write
                self.writer.add_scalar("VMap/mean", diag["vmap_mean"],
                                       self.global_step)
                self.writer.add_scalar("VMap/std", diag["vmap_std"],
                                       self.global_step)
            avg_accs.append(avg_acc)
            pass1s.append(pass1)
            viz_payload.append((chains, agent._root_step, hid_bank))

            has_sig = any(abs(float(st.get("v_target", 0.0))) > eps_vt
                          for ch in chains for st in ch)
            if not has_sig:
                rej["trees_no_v_signal"] += 1
                continue

            # dedup by step identity; keep per-sample fields
            local_samples, seen = [], set()
            for chain in chains:
                for st in chain:
                    sid = id(st)
                    if sid in seen:
                        continue
                    seen.add(sid)
                    p_ids = st.get("prompt_ids")
                    c_ids = st.get("completion_ids")
                    if not p_ids or c_ids is None or len(c_ids) == 0:
                        continue
                    local_samples.append(dict(
                        prompt_ids=list(map(int, p_ids))[-args.max_prompt_length:],
                        completion_ids=list(map(int, c_ids)),
                        tree_id=idx,
                        state_value=float(st.get("state_value") or 0.0),
                        reward=float(st.get("reward") or 0.0),
                        is_leaf=bool(st.get("is_leaf", False)),
                        depth=int(st.get("current_depth", 0)),
                        is_correct=bool(st.get("is_correct", False)),
                        on_path=bool(st.get("on_path", False)),
                        v_target=float(st.get("v_target", 0.0)),
                        v_pred=float(st.get("v_pred") or 0.0),
                        has_answer=has_answer(st),
                    ))
            if not local_samples:
                rej["trees_no_samples"] += 1
                continue

            if args.num_trees != -1 and mse_tree_cnt < args.num_trees:
                mse_nodes.extend(dict(prompt_ids=s["prompt_ids"],
                                      completion_ids=s["completion_ids"],
                                      v_target=s["v_target"]) for s in local_samples)
                mse_tree_cnt += 1

            if avg_acc >= 0.8:
                rej["trees_high_acc"] += 1
                continue  # training-stability skip

            buckets: dict[tuple, list[dict]] = defaultdict(list)
            for s in local_samples:
                buckets[tuple(s["prompt_ids"])].append(s)

            tree_groups = 0
            for samples in buckets.values():
                if group_count >= args.num_groups or tree_groups >= 2:
                    break
                if args.breadth > 0 and len(samples) < args.breadth:
                    rej["buckets_small"] += 1
                    continue
                r_vals = [s["reward"] for s in samples]
                if max(r_vals) - min(r_vals) <= eps_reward:
                    rej["buckets_no_reward_var"] += 1
                    continue
                if max(s["v_target"] for s in samples) <= eps_vt:
                    rej["buckets_no_pos_v_target"] += 1
                    continue
                ss = sorted(samples, key=lambda s: s["reward"], reverse=True)
                vals = np.asarray([s["reward"] for s in ss], np.float32)
                start, _ = best_var_window_constrained(vals, np.ones_like(vals, bool),
                                                       args.breadth)
                chosen = ss[:args.breadth] if start is None else ss[start:start + args.breadth]
                step_samples.extend(chosen)
                group_count += 1
                tree_groups += 1

        batch_avg_acc = float(np.mean(avg_accs)) if avg_accs else 0.0
        batch_pass1 = float(np.mean(pass1s)) if pass1s else 0.0
        self.writer.add_scalar("avgAcc", batch_avg_acc, self.global_step)
        self.writer.add_scalar("pass@1", batch_pass1, self.global_step)

        # Poincaré disk viz per tree (headline feature, reference 2962-3144)
        from .viz import plot_tree_disk

        viz_dir = os.path.join(args.output_dir, "viz", f"step-{self.global_step}")
        for tid, (chains, root_step, _bank) in enumerate(viz_payload[:4]):
            plot_tree_disk(chains, root_step,
                           os.path.join(viz_dir, f"tree{tid}_disk.png"),
                           title=f"tree{tid}")
        for k, v in rej.items():
            if v:
                self.writer.add_scalar(f"Rollout/rej_{k}", v, self.global_step)
        return dict(step_samples=step_samples, mse_nodes=mse_nodes,
                    avg_acc=batch_avg_acc, pass_at_1=batch_pass1,
                    num_groups=group_count, viz=viz_payload, rejections=rej)

    # ------------------------------------------------------------- update

    def train_step(self, inputs: list[dict]) -> dict:
        if self.args.profile_dir and self.global_step == self.args.profile_step:
            with jax.profiler.trace(self.args.profile_dir):
                m = self._train_step_inner(inputs)
        else:
            m = self._train_step_inner(inputs)
        # save boundary checked HERE so early-return steps (no trainable
        # samples) cannot bump global_step past a due save silently
        if self.args.save_steps > 0 and self.global_step % self.args.save_steps == 0:
            self.save_checkpoint()
        return m

    def _train_step_inner(self, inputs: list[dict]) -> dict:
        t0 = time.perf_counter()
        rollout = self.rollout_batch(inputs)
        t_rollout = time.perf_counter() - t0
        samples = rollout["step_samples"]
        metrics = dict(avg_acc=rollout["avg_acc"], pass_at_1=rollout["pass_at_1"],
                       num_groups=rollout["num_groups"], rollout_s=t_rollout,
                       n_samples=len(samples))
        metrics.update({f"rej_{k}": v for k, v in
                        rollout.get("rejections", {}).items() if v})
        if not samples:
            # every tree/bucket was filtered — say WHY, not a bare loss=0
            metrics["loss"] = 0.0
            metrics["skipped"] = "no_trainable_groups"
            self.global_step += 1
            return metrics

        pad_id = int(getattr(self.tokenizer, "pad_token_id", 0) or 0)
        eos_id = getattr(self.tokenizer, "eos_token_id", None)
        packed = losses.pack_samples(samples, pad_id, eos_id, self.args.max_prompt_length)
        if packed is None:
            metrics["loss"] = 0.0
            metrics["skipped"] = "pack_samples_empty"
            self.global_step += 1
            return metrics

        # align to the rows pack_samples actually kept (defensive drops must
        # not shift later rows onto a neighbor's advantage/target)
        kept_samples = [samples[i] for i in packed.pop("kept").tolist()]
        key2gid: dict[tuple, int] = {}
        gids = []
        for s in kept_samples:
            key = tuple(s["prompt_ids"])
            key2gid.setdefault(key, len(key2gid))
            gids.append(key2gid[key])
        B_real = len(kept_samples)
        adv = losses.group_advantages(np.asarray([s["reward"] for s in kept_samples]),
                                      np.asarray(gids), self.args.scale_rewards)
        Bb = packed["ids"].shape[0]
        advantages = np.zeros(Bb, np.float32)
        advantages[:B_real] = adv
        v_target = np.zeros(Bb, np.float32)
        v_target[:B_real] = [s["v_target"] for s in kept_samples]
        samples = kept_samples

        batch = {k: jnp.asarray(v) for k, v in packed.items()}
        batch["advantages"] = jnp.asarray(advantages)
        batch["v_target"] = jnp.asarray(v_target)

        # chosen-sample dumps per step/group (reference 1795-1837)
        try:
            from ..search.mcts import dump_step as _dump_step

            dump_root = os.path.join(self.args.output_dir, "train",
                                     f"step-{self.global_step}")
            counts: dict[int, int] = defaultdict(int)
            for s, gid in zip(samples, gids):
                i_local = counts[gid]
                counts[gid] += 1
                dec = getattr(self.tokenizer, "decode", None)
                _dump_step({
                    "state_value": s.get("reward"),
                    "prompt_ids": s["prompt_ids"],
                    "completion_ids": s["completion_ids"],
                    "prompt": dec(s["prompt_ids"], skip_special_tokens=False) if dec else "",
                    "completion": dec(s["completion_ids"], skip_special_tokens=False) if dec else "",
                    "ground_truth": s.get("ground_truth"),
                }, os.path.join(dump_root, f"group-{gid}", f"tmp{i_local}.txt"))
        except Exception:
            pass

        ref_logps = None
        if self.args.beta > 0.0:
            if self.ref_params is None:
                self.ref_params = jax.tree.map(jnp.copy, self.params)
            ref_logps = losses.ref_logps_fn(self.ref_params, batch, self.model_cfg,
                                            self.args.temperature)

        # num_trees != -1: value MSE over ALL nodes of the first num_trees
        # trees replaces the step-sample MSE (reference 2171-2296) — grads
        # accumulated over micro-batches, injected into the main update
        extra_grads = None
        value_w_override = None
        mse_nodes = rollout.get("mse_nodes") or []
        if self.args.num_trees != -1 and mse_nodes:
            mbs = max(1, int(self.args.mse_micro_bs))
            acc = None
            total_cnt = 0.0
            total_sq = 0.0
            with self.mesh:
                for lo in range(0, len(mse_nodes), mbs):
                    chunk = mse_nodes[lo:lo + mbs]
                    packed_m = losses.pack_samples(chunk, pad_id, eos_id,
                                                   self.args.max_prompt_length,
                                                   batch_multiple=1)
                    if packed_m is None:
                        continue
                    kept_m = [chunk[i] for i in packed_m.pop("kept").tolist()]
                    mb = {k: jnp.asarray(v) for k, v in packed_m.items()}
                    vt = np.zeros(packed_m["ids"].shape[0], np.float32)
                    vt[:len(kept_m)] = [float(c.get("v_target", 0.0)) for c in kept_m]
                    mb["v_target"] = jnp.asarray(vt)
                    sq, cnt, grads = self._value_sumsq_grad(self.params, self.head, mb)
                    total_sq += float(sq)
                    total_cnt += float(cnt)
                    acc = grads if acc is None else jax.tree.map(
                        lambda a, g: a + g, acc, grads)
            if acc is not None and total_cnt > 0:
                scale = self.args.value_w / total_cnt
                extra_grads = jax.tree.map(
                    lambda g: (g.astype(jnp.float32) * scale), acc)
                value_w_override = 0.0
                metrics["value_loss_all_nodes"] = total_sq / total_cnt
                self.writer.add_scalar("Loss/ValueLoss", total_sq / total_cnt,
                                       self.global_step)

        t1 = time.perf_counter()
        # multi-epoch PPO (num_iterations > 1): cache the pre-update policy
        # logps once so later iterations' PPO ratio/clip are live. The
        # reference defines this knob but hard-codes the on-policy detach
        # (mtpo_trainer.py:2370); iteration 1 with old_logps is identical to
        # on-policy (ratio == 1), so num_iterations=1 skips the extra pass.
        old_logps = None
        if self.args.num_iterations > 1:
            with self.mesh:
                old_logps = losses.ref_logps_fn(self.params, batch, self.model_cfg,
                                                self.args.temperature)
        with self.mesh:
            for _it in range(max(1, self.args.num_iterations)):
                self.params, self.head, self.opt_state, step_metrics = self._update(
                    self.params, self.head, self.opt_state, batch, ref_logps,
                    extra_grads, value_w_override=value_w_override,
                    old_logps=old_logps)
        step_metrics = {k: float(v) for k, v in step_metrics.items()}
        metrics.update(step_metrics, update_s=time.perf_counter() - t1)

        # weight sync = pointer swap (the whole reference NCCL plane, gone)
        self.engine.update_params(self.params)
        self.value_fn.update_params(self.params, self.head)

        for name, key in (("Loss/ValueLoss", "value_loss"), ("Loss/PolicyLoss", "policy_loss"),
                          ("Loss/Loss", "loss"), ("Metrics/KL", "kl")):
            if key in step_metrics:
                self.writer.add_scalar(name, step_metrics[key], self.global_step)

        # Metrics/ContextLength: mean prompt+completion length over the
        # step's ANSWERED samples (reference mtpo_trainer.py:2420-2444)
        ctx = [len(s["prompt_ids"]) + len(s["completion_ids"])
               for s in samples if s.get("has_answer", False)]
        avg_ctx = float(np.mean(ctx)) if ctx else 0.0
        metrics["context_length"] = avg_ctx
        self.writer.add_scalar("Metrics/ContextLength", avg_ctx, self.global_step)

        self.global_step += 1
        return metrics

    def train(self, resume_from_checkpoint: Optional[str] = None, max_steps: Optional[int] = None):
        if resume_from_checkpoint:
            self.load_checkpoint(resume_from_checkpoint)
        elif self.args.resume_from_checkpoint:
            self.load_checkpoint(self.args.resume_from_checkpoint)

        steps = max_steps or (self.args.max_steps if self.args.max_steps > 0 else None)
        bs = self.args.per_device_train_batch_size
        data = list(self.train_dataset)
        i = 0
        history = []
        while True:
            if steps is not None and self.global_step >= steps:
                break
            if i >= len(data):
                i = 0
            batch = data[i : i + bs]
            i += bs
            if not batch:
                break
            m = self.train_step(batch)
            history.append(m)
            if self.args.debug_print:
                print(f"[step {self.global_step}] " +
                      " ".join(f"{k}={v:.4g}" for k, v in m.items()
                               if isinstance(v, (int, float))))
            if steps is None and i >= len(data):
                break
        self.save_checkpoint()
        self.finish_pending_saves()  # final save must land before returning
        return history

    # ------------------------------------------------------------- checkpoints

    def _ckpt_dir(self) -> str:
        return os.path.join(self.args.output_dir, "checkpoints")

    def finish_pending_saves(self):
        """Block until the in-flight async save (if any) is durably on disk
        and advance the `latest` pointer to it. Called before a new save,
        before any restore, and at the end of train()."""
        _finish_pending_saves()

    def save_checkpoint(self):
        """Asynchronous orbax save: device arrays are snapshotted to host
        synchronously, then serialized on a background thread — the next
        rollout phase overlaps the disk write instead of stalling on it
        (multi-GB sharded states at production scale). Orbax finalizes the
        checkpoint dir with an atomic rename, and resume prefers the newest
        FINALIZED step_* dir (see load_checkpoint), so neither a crash
        mid-write nor a crash before the `latest` pointer lands can resume
        from a partial state."""
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(self._ckpt_dir()), f"step_{self.global_step}")
        _finish_pending_saves()  # at most one save in flight
        if _ASYNC_CKPT["ckptr"] is None:
            _ASYNC_CKPT["ckptr"] = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        _ASYNC_CKPT["ckptr"].save(path, args=ocp.args.StandardSave(
            {"params": self.params, "head": self.head,
             "opt_state": self.opt_state}), force=True)
        _ASYNC_CKPT["pending"] = (self._ckpt_dir(), self.global_step)

    def load_checkpoint(self, path: Optional[str] = None):
        import orbax.checkpoint as ocp

        _finish_pending_saves()
        if path in (None, True):
            # Resume from the newest FINALIZED checkpoint: orbax writes to a
            # *.orbax-checkpoint-tmp-* dir and renames atomically on commit,
            # so a plain step_N dir existing proves it is complete. The
            # `latest` pointer file is kept for operators/back-compat but a
            # newer finalized dir wins (covers a crash after commit but
            # before the pointer write).
            steps = []
            if os.path.isdir(self._ckpt_dir()):
                for name in os.listdir(self._ckpt_dir()):
                    m = re.fullmatch(r"step_(\d+)", name)
                    if m:
                        steps.append(int(m.group(1)))
            latest = os.path.join(self._ckpt_dir(), "latest")
            if not steps and not os.path.exists(latest):
                return False
            step = max(steps) if steps else int(open(latest).read().strip())
            path = os.path.join(os.path.abspath(self._ckpt_dir()), f"step_{step}")
            self.global_step = step
        else:
            # explicit path: recover the step counter from the dir name so
            # resumed runs don't restart metrics/saves at step 0
            import re as _re

            m = _re.search(r"step[_-](\d+)", os.path.basename(os.path.normpath(str(path))))
            if m:
                self.global_step = int(m.group(1))
        target = {"params": self.params, "head": self.head, "opt_state": self.opt_state}
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, target)
        self.params = restored["params"]
        self.head = restored["head"]
        self.opt_state = restored["opt_state"]
        self.engine.update_params(self.params)
        self.value_fn.update_params(self.params, self.head)
        return True

    def save_model(self, out_dir: str, src_config_dir: Optional[str] = None):
        """Export policy (HF layout) + value head artifact — the
        split_valuehead.py convention, no post-processing step needed."""
        from ..models import loader

        loader.export_hf(self.params, self.model_cfg, out_dir, src_config_dir=src_config_dir)
        loader.save_value_head(os.path.join(out_dir, "value_head.npz"), self.head)
        loader.save_value_head(os.path.join(out_dir, "value_head.pt"), self.head)
