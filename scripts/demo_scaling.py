#!/usr/bin/env python
"""Demonstrate the paper's capability claims end-to-end on real hardware.

The reference publishes three headline figures with no numeric tables
(reference README.md:48-58, assets/fig{2,3,4}*.png):

  fig2  value-head top-1 leaf accuracy > average leaf accuracy
  fig3  value-guided test-time scaling: accuracy rises with num_sim
  fig4  latent-space pruning improves search at fixed budget

No reference checkpoints are reachable in this environment (zero egress),
so AIME parity cannot be run — instead this script reproduces the CLAIMS
with a tiny model trained in-situ on a synthetic verifiable task, using
the REAL framework end to end: the real Engine (continuous KV-cached
generation + fused h0 pooling), the real ValueFunction (Poincaré
projection + linear head), the real MTPOTrainer loop (MCTS rollouts ->
hyperbolic V-map shaping -> jitted GRPO+value update), and the real
value-mode MCTS + pick_best_leaf at eval.

Task: chained integer arithmetic. A question lists a start value and a
sequence of operations ("start with 7 ; add 5 ; mul 3 ; ... what is the
result ?"); the expert protocol computes one operation per STEP-k inside
<think> tags and emits "<answer> N </answer>" on the last one. Numbers
are single tokens, so each step is a learned fact lookup — an
undertrained model makes per-step slips that compound over the chain,
which is exactly the error structure MCTS + a value head exploit.

Stages:
  A. SFT warmup on expert traces rendered through the SAME chat template
     + STEP-header protocol the MCTS agent uses, stopped early at a
     target per-fact accuracy (default ~0.82) so the policy is decent
     but imperfect.
  B. Real MTPOTrainer steps (GRPO + all-node value MSE, num_trees mode)
     — trains the value head against the hyperbolic potential.
  C. Experiments on held-out questions:
       fig3: pass@1(pick_best_leaf) vs num_sim in {8, 32, 128}, with a
             value_trust=0 control arm (identical search semantics,
             expansion NOT guided by v_pred) to isolate the value head's
             guidance contribution;
       fig2: argmax-v_pred leaf accuracy vs average answered-leaf
             accuracy (pure value-head signal, no ground truth);
       fig4: prune_per=8 vs pruning off at fixed num_sim.

Search semantics during eval mirror the reference's value mode
(reference eval/rollout_jsonl.py:1169-1243): reward_fns with the true
answer ARE passed to the agent, so terminal backups use the rule grader
— both arms share this, so arm differences are attributable to value
guidance alone.

Outputs: DEMO_SCALING.json (all records) + a markdown table on stdout;
see DEMO_SCALING.md for the committed run.

Env knobs (defaults = the committed run):
  TASK            "chain" (run 2) or "nav" (run 3) — see below
  H, NL           model width/depth          (256, 4)
  SFT_TARGET      stop SFT at this per-fact holdout accuracy (0.93 —
                  high enough that chain errors are SAMPLING noise the
                  representation can flag, not missing knowledge)
  SFT_MAX_STEPS   SFT step cap (12000)
  SFT_DECAY       cosine-decay horizon in steps (0 = SFT_MAX_STEPS, the
                  committed runs); < max_steps holds a low stable LR for
                  the long grind toward CHOICE_TARGET (peak-LR grinds
                  diverge — run 5 attempt 1 went NaN at ~step 3800)
  CHOICE_TARGET   also require the CHOICE probe (nav lookahead op) to
                  reach this before SFT stops (0 = committed runs 2/3;
                  run 5 uses 0.9 so the latent encodes the decision)
  RL_STEPS        MTPOTrainer steps (24)
  N_EVAL          held-out eval questions (24)
  SIMS            comma list of num_sim points ("8,32,128")
  SEED            base seed (0)
  DEMO_OUT        output dir (/tmp/lapha-demo-scaling[-TASK])

TASK=nav (run 3, the fig2 vehicle): run 2 attributed fig2's miss to the
chain task's error structure — errors were single-token sampling slips,
and a post-slip state is arithmetically coherent, so NO visible-state
feature separates doomed leaves from good ones (DEMO_SCALING.md). The
nav task makes errors CHOICE errors instead: the question gives a start
value, a TARGET, and a 3-op menu ("start with 7 ; reach 26 ; ops add 3
, mul 2 , sub 4 ; at most 6 steps ?"); the expert emits the BFS
shortest path, one op per STEP. Choosing needs lookahead (the menu
varies per question, so it cannot be memorised), so an SFT policy picks
legal-but-doomed ops; the resulting states are arithmetically coherent
AND visibly off-track — their doom is a function of (current value,
target, steps left), all in plain sight of the pooled latent. fig2 for
nav is scored over ALL terminal leaves (answered or not; the rule
grader marks unanswered/invalid chains 0 — exactly how the reference's
graders treat a leaf with no \\boxed answer), with full-chain validity
grading: every step equation must be true, chain-continuous, and use a
menu op.
"""
from __future__ import annotations

import json
import math
import os
import random
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import lapha_tpu

lapha_tpu.enable_compilation_cache()
if os.getenv("JAX_PLATFORMS"):
    # the axon sitecustomize re-forces its platform; env alone is not enough
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lapha_tpu.engine import SamplingParams
from lapha_tpu.models import Qwen2Config, qwen2
from lapha_tpu.search import LatentBank, MCTSAgent
from lapha_tpu.search.best_leaf import pick_best_leaf
from lapha_tpu.train.config import MTPOConfig
from lapha_tpu.train.trainer import MTPOTrainer

MAXV = 300          # running values stay in [0, MAXV]
OPS = ("add", "sub", "mul")
_ANS_RE = re.compile(r"<answer>\s*(-?\d+)\s*</answer>")
_STEP_RE = re.compile(r"(-?\d+)\s+(add|sub|mul)\s+(-?\d+)\s+=\s+(-?\d+)")


# --------------------------------------------------------------- tokenizer
class DemoTok:
    """Frozen-vocab whitespace tokenizer with the smoke-test chat template.

    Numbers 0..MAXV are single tokens, so arithmetic is a pure learned
    fact and per-step accuracy is a clean knob. The template mirrors
    scripts/smoke_train_tpu.py's ChatTok (role-tagged lines + trailing
    assistant tag) — the MCTS agent appends its own "STEP-k:\\n<think>\\n"
    header after rendering (search/mcts.py:355-362)."""

    eos_token_id = 1
    pad_token_id = 0

    def __init__(self):
        words = (["<pad>", "<eos>", "<unk>", "\n", "<|system|>", "<|user|>",
                  "<|assistant|>", "<|tool|>", "<|im_end|>",
                  "<think>", "</think>", "<answer>", "</answer>",
                  "start", "with", ";", "=", "?", "what", "is", "the",
                  "result", "then", "wait", "Solve", "one", "operation",
                  "per", "step.", "Limit", "steps.", "Q:",
                  # nav task (run 3) — stays under the same 128-padded
                  # vocab size, so chain-task checkpoints are unaffected
                  "reach", "ops", ",", "at", "most", "steps"]
                 + [f"STEP-{k}:" for k in range(1, 10)]
                 + [str(n) for n in range(0, MAXV + 1)]
                 + [str(k) for k in range(1, 10)]  # dedup below keeps first
                 + list(OPS))
        self.vocab: dict[str, int] = {}
        for w in words:
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab)
        self.words = {i: w for w, i in self.vocab.items()}
        self.unk = self.vocab["<unk>"]

    def __len__(self):
        return len(self.vocab)

    def __call__(self, text, add_special_tokens=True, **kw):
        toks = re.findall(r"\n|\S+", text)
        return {"input_ids": [self.vocab.get(w, self.unk) for w in toks]}

    def decode(self, ids, skip_special_tokens=True, **kw):
        out = []
        for i in ids:
            w = self.words.get(int(i), "<unk>")
            if skip_special_tokens and w in ("<pad>", "<eos>"):
                continue
            if w == "\n":
                out.append("\n")
            else:
                if out and out[-1] != "\n":
                    out.append(" ")
                out.append(w)
        return "".join(out)

    def apply_chat_template(self, conversation, tools=None, tokenize=False,
                            add_generation_prompt=True, **kw):
        parts = [f"<|{m['role']}|> {m.get('content', '')}"
                 for m in conversation]
        if add_generation_prompt:
            parts.append("<|assistant|>")
        return "\n".join(parts) + "\n"


# --------------------------------------------------------------- the task
def sample_question(rng: random.Random, n_ops: int):
    """One chained-arithmetic instance: question text, op list, trace."""
    v = rng.randint(2, 20)
    ops = []
    while len(ops) < n_ops:
        op = rng.choice(OPS)
        k = rng.randint(2, 9)
        r = {"add": v + k, "sub": v - k, "mul": v * k}[op]
        if 0 <= r <= MAXV:
            ops.append((op, k, v, r))
            v = r
    q = f"start with {ops[0][2]} ; " + " ; ".join(
        f"{op} {k}" for (op, k, _v, _r) in ops) + " ; what is the result ?"
    return {"question": q, "ground_truth": str(v), "ops": ops,
            "support_material_path": []}


def step_completion(j: int, op: str, k: int, v: int, r: int, last: bool):
    body = f"{v} {op} {k} = {r} </think>"
    if last:
        body += f"\n<answer> {r} </answer>"
    return f"STEP-{j}:\n<think>\n" + body


# ------------------------------------------------------ nav task (run 3)
def _nav_apply(op: str, k: int, v: int) -> int:
    return {"add": v + k, "sub": v - k, "mul": v * k}[op]


def _nav_menu(rng: random.Random):
    """3 distinct ops: one small mul (makes wrong turns overshoot-fatal)
    + two add/sub. Menus vary per question so choice cannot be memorised
    — it is a lookahead problem over (value, target, menu, steps left)."""
    menu = [("mul", rng.randint(2, 3))]
    while len(menu) < 3:
        cand = (rng.choice(("add", "sub")), rng.randint(2, 9))
        if cand not in menu:
            menu.append(cand)
    rng.shuffle(menu)
    return menu


def nav_bfs(v0: int, menu, max_depth: int):
    """BFS over values in [0, MAXV]: dist[v] = min ops from v0, parent
    pointers for the canonical shortest path (ties: menu order)."""
    dist, par = {v0: 0}, {}
    frontier = [v0]
    for d in range(1, max_depth + 1):
        nxt = []
        for v in frontier:
            for op, k in menu:
                r = _nav_apply(op, k, v)
                if 0 <= r <= MAXV and r not in dist:
                    dist[r] = d
                    par[r] = (v, op, k)
                    nxt.append(r)
        frontier = nxt
    return dist, par


def sample_question_nav(rng: random.Random, n_ops: int):
    """One reach-the-target instance whose BFS-shortest solution is
    exactly n_ops long; ex["ops"] is the expert path in the chain task's
    (op, k, v, r) format so step_completion/expert_pairs are shared."""
    while True:
        v0 = rng.randint(2, 20)
        menu = _nav_menu(rng)
        dist, par = nav_bfs(v0, menu, n_ops)
        cands = sorted(t for t, d in dist.items() if d == n_ops)
        if len(cands) < 3:
            continue
        t = rng.choice(cands)
        ops, cur = [], t
        while cur != v0:
            pv, op, k = par[cur]
            ops.append((op, k, pv, cur))
            cur = pv
        ops.reverse()
        menu_str = " , ".join(f"{op} {k}" for op, k in menu)
        q = (f"start with {v0} ; reach {t} ; ops {menu_str} ; "
             f"at most 6 steps ?")
        return {"question": q, "ground_truth": str(t), "ops": ops,
                "menu": menu, "v0": v0, "support_material_path": []}


def reward_nav(completion, gt):
    """Per-step rule grader (what MCTS terminal backups / the trainer
    see): the answer must equal the target AND be the result of a TRUE
    equation in this step. Full-chain validity needs earlier steps,
    which a per-step grader cannot see — eval grades the whole chain
    with grade_chain_nav (the honest pass@1/fig2 number)."""
    m = _ANS_RE.search(completion or "")
    if not (m and gt is not None and m.group(1) == str(gt)):
        return 0.0
    eqs = _STEP_RE.findall(completion or "")
    if not eqs:
        return 0.0
    v, op, k, r = eqs[-1]
    return float(_nav_apply(op, int(k), int(v)) == int(r)
                 and int(r) == int(gt))


def nav_chain_state(chain, ex):
    """Replay a chain against the rules -> (valid, current_value,
    steps_used, answer_str_or_None). Stops at the first rule violation
    (equation false / menu-illegal / chain-discontinuous) or answer."""
    cur, menu, steps = ex["v0"], set(map(tuple, ex["menu"])), 0
    for st in chain:
        c = st.get("completion") or ""
        if not c.strip():
            continue
        eqs = _STEP_RE.findall(c)
        if len(eqs) != 1:
            return False, cur, steps, None
        v, op, k, r = eqs[0]
        v, k, r = int(v), int(k), int(r)
        if v != cur or (op, k) not in menu or _nav_apply(op, k, v) != r:
            return False, cur, steps, None
        cur = r
        steps += 1
        m = _ANS_RE.search(c)
        if m:
            return True, cur, steps, m.group(1)
    return True, cur, steps, None


def grade_chain_nav(chain, ex) -> float:
    """Full-chain rule grader: chain-continuous from v0, every equation
    true and menu-legal, answered value == final value == target."""
    valid, cur, _steps, ans = nav_chain_state(chain, ex)
    return float(valid and ans == ex["ground_truth"]
                 and cur == int(ex["ground_truth"]))


class DemoAgent(MCTSAgent):
    TOOLS: dict = {}
    TOOLS_DESCRIPTION = ""
    SYSTEM_TEMPLATE = "Solve one operation per step. Limit {step_limit} steps."
    USER_TEMPLATE = "{support_material_str}Q: {question}"


def expert_pairs(tok: DemoTok, ex: dict, depth: int):
    """(prompt_ids, target_ids) per step, rendered EXACTLY like the agent:
    chat template over accumulated assistant messages + STEP header
    (search/mcts.py:202-211, 355-364)."""
    sysmsg = DemoAgent.SYSTEM_TEMPLATE.format(step_limit=depth)
    usermsg = DemoAgent.USER_TEMPLATE.format(
        support_material_str="", question=ex["question"])
    messages = [{"role": "system", "content": sysmsg},
                {"role": "user", "content": usermsg}]
    pairs = []
    n = len(ex["ops"])
    for j, (op, k, v, r) in enumerate(ex["ops"], start=1):
        render = tok.apply_chat_template(messages, tokenize=False,
                                         add_generation_prompt=True)
        header = f"STEP-{j}:\n<think>\n"
        prompt_ids = tok(render + header)["input_ids"]
        comp = step_completion(j, op, k, v, r, last=(j == n))
        body = comp[len(header):]
        target_ids = tok(body)["input_ids"] + [tok.eos_token_id]
        pairs.append((prompt_ids, target_ids, (v, op, k, r)))
        messages = messages + [{"role": "assistant", "content": comp}]
    return pairs


# --------------------------------------------------------------- SFT warmup
def sft_warmup(tok, cfg, params, rng, *, target_acc, max_steps, depth,
               sample_fn=None, len_lo=2, len_hi=4, choice_target=0.0,
               batch=64, seqlen=224, lr=3e-3, decay_steps=0, log=print):
    """Teacher-forced CE on expert traces; stop at target per-fact holdout
    accuracy so the policy is deliberately imperfect.

    ``choice_target`` > 0 additionally requires the CHOICE probe (the op
    token opening each step — nav's lookahead decision) to reach that
    accuracy before stopping. fig2's premise is that the policy's hidden
    state ENCODES the decision-relevant state; a run-3/4 policy stopped at
    fact 0.96 / choice 0.61 demonstrably does not (probe_value_head.py
    round-5 separability probe), so run 5 trains the representation first
    and leaves imperfection to sampling temperature instead.

    f32 master weights during SFT (cast back to the model dtype at the
    end): bf16 params plateau early — once the cosine-decayed update drops
    below bf16's ~2^-8 relative resolution it rounds to zero."""
    import dataclasses

    sample_fn = sample_fn or sample_question

    model_dtype = cfg.dtype
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    params = jax.tree.map(lambda x: x.astype(jnp.float32)
                          if x.dtype == model_dtype else x, params)
    warm = min(100, max(1, max_steps // 10))
    # decay_steps < max_steps decouples the LR horizon from the step cap:
    # cosine to lr*0.03 by `decay_steps`, then HOLD there — long grinds
    # toward a hard probe target (run 5's choice_target) train the tail
    # at a stable low LR instead of thousands of steps at peak LR (run
    # 5's first attempt diverged to NaN at ~step 3800 exactly that way)
    decay = max(min(int(decay_steps) or max_steps, max_steps), warm + 2)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warm, decay,
                                               end_value=lr * 0.03)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=0.01, mu_dtype=jnp.float32))
    opt_state = optimizer.init(params)

    def make_batch(n_ex):
        ids = np.zeros((batch, seqlen), np.int32)
        mask = np.zeros((batch, seqlen), np.float32)
        attn = np.zeros((batch, seqlen), np.int32)
        i = 0
        while i < batch:
            ex = sample_fn(rng, rng.randint(len_lo, len_hi))
            for (p_ids, t_ids, _fact) in expert_pairs(tok, ex, depth):
                if i >= batch:
                    break
                row = (p_ids + t_ids)[:seqlen]
                ids[i, :len(row)] = row
                attn[i, :len(row)] = 1
                lo = min(len(p_ids), seqlen)
                mask[i, lo:len(row)] = 1.0
                i += 1
        return jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(mask)

    @jax.jit
    def step(params, opt_state, ids, attn, mask):
        def lfn(p):
            logits, _, _ = qwen2.forward(p, cfg, ids[:, :-1],
                                         attention_mask=attn[:, :-1])
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = jnp.take_along_axis(lp, ids[:, 1:, None], axis=-1)[..., 0]
            m = mask[:, 1:]
            return -(tgt * m).sum() / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(lfn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # holdout probes over fresh expert rows: FACT = argmax accuracy of
    # the result token right after "=" (execution); CHOICE = argmax
    # accuracy of the op token opening the step body (for nav this is
    # the lookahead decision — the knob fig2 turns; for chain a copy)
    probe_rng = random.Random(10_007)
    probe = []
    while len(probe) < 256:
        ex = sample_fn(probe_rng, probe_rng.randint(len_lo, len_hi))
        for (p_ids, t_ids, fact) in expert_pairs(tok, ex, depth):
            eq = tok.vocab["="]
            row = p_ids + t_ids
            pos = len(p_ids) + t_ids.index(eq) + 1  # index of r
            pos_op = len(p_ids) + 1                 # body = "v OP k = r"
            if pos < seqlen:
                probe.append((row, pos, pos_op))
    p_ids2 = np.zeros((len(probe), seqlen), np.int32)
    p_attn = np.zeros_like(p_ids2)
    p_pos = np.zeros((len(probe),), np.int32)
    p_posop = np.zeros((len(probe),), np.int32)
    for i, (row, pos, pos_op) in enumerate(probe):
        row = row[:seqlen]
        p_ids2[i, :len(row)] = row
        p_attn[i, :len(row)] = 1
        p_pos[i] = pos
        p_posop[i] = pos_op

    @jax.jit
    def probe_acc(params):
        logits, _, _ = qwen2.forward(
            params, cfg, jnp.asarray(p_ids2[:, :-1]),
            attention_mask=jnp.asarray(p_attn[:, :-1]))
        pred = jnp.argmax(logits, axis=-1)

        def hit(idx):
            return (jnp.take_along_axis(pred, idx[:, None] - 1,
                                        axis=1)[:, 0]
                    == jnp.asarray(p_ids2)[jnp.arange(len(probe)), idx]
                    ).mean()

        return hit(jnp.asarray(p_pos)), hit(jnp.asarray(p_posop))

    def score(a, c):
        # progress toward BOTH targets, each capped at met
        s = min(a / max(target_acc, 1e-9), 1.0)
        if choice_target:
            s += min(c / choice_target, 1.0)
        return s

    acc = choice = 0.0
    best = (-1.0, params, 0.0, 0.0)  # (score, params ref, fact, choice)
    for it in range(max_steps):
        ids, attn, mask = make_batch(batch)
        params, opt_state, loss = step(params, opt_state, ids, attn, mask)
        if (it + 1) % 50 == 0:
            lf = float(loss)
            if not math.isfinite(lf):
                # divergence guard: a NaN loss never recovers (and NaN
                # accs would spin the stop rule to the cap — run 5's
                # first attempt burned 16k steps that way). jax arrays
                # are immutable, so the best-probe snapshot is a free ref.
                log(f"[sft {it + 1}] loss={lf} — DIVERGED, restoring best "
                    f"probe (fact={best[2]:.3f} choice={best[3]:.3f})")
                break
            a, c = probe_acc(params)
            acc, choice = float(a), float(c)
            log(f"[sft {it + 1}] loss={lf:.4f} "
                f"fact_acc={acc:.3f} choice_acc={choice:.3f}")
            if score(acc, choice) > best[0]:
                best = (score(acc, choice), params, acc, choice)
            if acc >= target_acc and choice >= choice_target:
                break
    if best[0] > score(acc, choice):
        _, params, acc, choice = best
    params = jax.tree.map(lambda x: x.astype(model_dtype)
                          if x.dtype == jnp.float32 else x, params)
    return params, acc, choice


# --------------------------------------------------------------- metrics
def leaf_records(chains, ex, grade=None):
    """Terminal-leaf records -> (records, by_leaf_id).

    Default (chain task, the committed run 2): answered leaves only,
    correct = answer == ground_truth. With a full-chain grader (nav):
    ALL terminal non-pruned leaves count, correct = grade(chain) — an
    unanswered or step-invalid chain scores 0, exactly how the
    reference's rule graders treat a leaf with no \\boxed answer."""
    recs, by_id = [], {}
    gt = ex["ground_truth"]
    for ch in chains:
        if not ch:
            continue
        leaf = ch[-1]
        if id(leaf) in by_id or leaf.get("_disabled"):
            continue
        m = _ANS_RE.search(leaf.get("completion") or "")
        if grade is None:
            if not m:
                continue
            correct = float(m.group(1) == gt)
        else:
            correct = float(grade(ch, ex))
        rec = {"correct": correct, "answered": bool(m),
               "v_pred": float(leaf.get("v_pred") or 0.0)}
        by_id[id(leaf)] = rec
        recs.append(rec)
    return recs, by_id


def eval_arm(questions, make_agent, *, num_sim, value_trust, prune_per,
             seed, grade=None, log=print):
    """One experiment arm -> per-question record list."""
    out = []
    for qi, ex in enumerate(questions):
        agent = make_agent(value_trust=value_trust, num_sim=num_sim,
                           prune_per=prune_per, seed=seed + 1000 * qi)
        t0 = time.time()
        chains = agent.search(question=ex["question"],
                              ground_truth=ex["ground_truth"],
                              support_material_path=None, cot=None)
        best = pick_best_leaf(chains, prefer_answer=True)
        recs, by_id = leaf_records(chains, ex, grade)
        if grade is None:
            m = _ANS_RE.search((best or {}).get("completion") or "")
            pass1 = float(bool(m) and m.group(1) == ex["ground_truth"])
        else:
            rec = by_id.get(id(best)) if best is not None else None
            if rec is None and best is not None:
                bch = next((c for c in chains if c and c[-1] is best), None)
                pass1 = float(grade(bch, ex)) if bch else 0.0
            else:
                pass1 = rec["correct"] if rec else 0.0
        avg_leaf = (sum(r["correct"] for r in recs) / len(recs)
                    if recs else 0.0)
        vh_top1 = (max(recs, key=lambda r: r["v_pred"])["correct"]
                   if recs else 0.0)
        any_correct = float(any(r["correct"] for r in recs))
        # answered-only view (the run-2 metric): does the head also
        # discriminate WITHIN the answered set, not just answered-vs-doomed
        ans = [r for r in recs if r["answered"]]
        avg_ans = (sum(r["correct"] for r in ans) / len(ans)
                   if ans else 0.0)
        vh_top1_ans = (max(ans, key=lambda r: r["v_pred"])["correct"]
                       if ans else 0.0)
        out.append({"q": qi, "pass1": pass1, "avg_leaf": avg_leaf,
                    "vh_top1": vh_top1, "any_correct": any_correct,
                    "avg_ans": avg_ans, "vh_top1_ans": vh_top1_ans,
                    "n_leaves": len(recs), "n_answered": len(ans),
                    "secs": time.time() - t0})
        log(f"  q{qi:02d} pass1={pass1:.0f} vh_top1={vh_top1:.0f} "
            f"avg_leaf={avg_leaf:.2f} leaves={len(recs)} "
            f"ans={len(ans)} ({time.time() - t0:.1f}s)")
    return out


def summarize(recs, key):
    return sum(r[key] for r in recs) / max(1, len(recs))


# --------------------------------------------------------------- main
def main():
    seed = int(os.getenv("SEED", "0"))
    task = os.getenv("TASK", "chain")
    assert task in ("chain", "nav"), task
    depth = 6
    out_dir = os.getenv(
        "DEMO_OUT", "/tmp/lapha-demo-scaling"
        + ("" if task == "chain" else f"-{task}"))
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    tok = DemoTok()
    log = print
    if task == "nav":
        sample_fn, reward_fn, grade = (sample_question_nav, reward_nav,
                                       grade_chain_nav)
        sft_lo, sft_hi, sft_target = 2, 5, float(
            os.getenv("SFT_TARGET", "0.95"))
    else:
        sample_fn, reward_fn, grade = sample_question, None, None
        sft_lo, sft_hi, sft_target = 2, 4, float(
            os.getenv("SFT_TARGET", "0.93"))

    cfg = Qwen2Config(
        vocab_size=((len(tok) + 127) // 128) * 128,
        hidden_size=int(os.getenv("H", "256")),
        intermediate_size=4 * int(os.getenv("H", "256")),
        num_hidden_layers=int(os.getenv("NL", "4")),
        num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=10000.0,
        dtype=jnp.bfloat16)
    params = qwen2.init_params(cfg, jax.random.key(seed))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    log(f"[demo] model {n_params / 1e6:.1f}M params, vocab {len(tok)}, "
        f"backend {jax.default_backend()}")

    ckpt = os.path.join(out_dir, "sft_params.npz")
    if os.getenv("DEMO_RESUME") and os.path.exists(ckpt):
        flat = dict(np.load(ckpt))
        fact_acc = float(flat.pop("__fact_acc__"))
        choice_acc = float(flat.pop("__choice_acc__", 0.0))
        leaves, treedef = jax.tree.flatten(params)
        params = jax.tree.unflatten(
            treedef, [jnp.asarray(flat[f"p{i}"]).astype(l.dtype)
                      for i, l in enumerate(leaves)])
        log(f"[demo] resumed SFT params from {ckpt} fact_acc={fact_acc:.3f}")
    else:
        # ---- stage A: SFT warmup to a deliberately-imperfect policy ----
        t0 = time.time()
        params, fact_acc, choice_acc = sft_warmup(
            tok, cfg, params, rng,
            target_acc=sft_target,
            max_steps=int(os.getenv("SFT_MAX_STEPS", "12000")),
            depth=depth, sample_fn=sample_fn, len_lo=sft_lo,
            len_hi=sft_hi, log=log,
            decay_steps=int(os.getenv("SFT_DECAY", "0")),
            choice_target=float(os.getenv("CHOICE_TARGET", "0")))
        log(f"[demo] SFT done in {time.time() - t0:.0f}s "
            f"fact_acc={fact_acc:.3f} choice_acc={choice_acc:.3f}")
        leaves = jax.tree.leaves(params)
        np.savez(ckpt, __fact_acc__=fact_acc, __choice_acc__=choice_acc,
                 **{f"p{i}": np.asarray(l.astype(jnp.float32))
                    for i, l in enumerate(leaves)})

    # ---- stage B: real MTPOTrainer loop (GRPO + all-node value MSE) ----
    def reward(completion, gt):
        m = _ANS_RE.search(completion or "")
        return float(bool(m) and gt is not None and m.group(1) == str(gt))

    reward = reward_fn or reward

    args = MTPOConfig(
        output_dir=os.path.join(out_dir, "train"),
        depth=depth, breadth=4, num_sim=16, num_pos_sim=99, prune_per=8,
        num_groups=8, max_model_len=512, max_prompt_length=384,
        max_completion_length=32, per_device_train_batch_size=4,
        num_generations=4, save_steps=0, bf16=True,
        gradient_checkpointing=False, mesh_model=1, leaves_per_sim=2,
        temperature=1.0, top_k=0, top_p=1.0, learning_rate=2e-4,
        lr_scheduler_type="constant", warmup_ratio=0.0,
        num_trees=8,  # value MSE over ALL tree nodes (the head trainer)
        num_iterations=2,  # PPO epochs: 2 gradient steps per rollout
        value_trust=0.5, v_prior=0.5, seed=seed, debug_print=False,
    )
    trainer = MTPOTrainer(model=(params, cfg), agent_cls_list=[DemoAgent],
                          args=args, reward_fns=[reward],
                          train_dataset=[], tokenizer=tok)
    rl_steps = int(os.getenv("RL_STEPS", "24"))
    rl_ckpt = os.path.join(out_dir, "rl_params.npz")
    if os.getenv("DEMO_RESUME") and os.path.exists(rl_ckpt):
        flat = dict(np.load(rl_ckpt))
        for name, tree in (("p", trainer.params), ("h", trainer.head)):
            leaves, treedef = jax.tree.flatten(tree)
            restored = jax.tree.unflatten(
                treedef, [jnp.asarray(flat[f"{name}{i}"]).astype(l.dtype)
                          for i, l in enumerate(leaves)])
            if name == "p":
                trainer.params = restored
            else:
                trainer.head = restored
        trainer.engine.update_params(trainer.params)
        trainer.value_fn.update_params(trainer.params, trainer.head)
        log(f"[demo] resumed RL params from {rl_ckpt}")
    else:
        t0 = time.time()
        rl_lo, rl_hi = (int(x) for x in os.getenv("RL_OPS", "3,5").split(","))
        # fig2 is a TRAINING-TIME curve in the reference (README.md:54-58,
        # assets/fig2_pass1_vs_avgacc.png): per-step pass@1 (argmax-v_pred
        # over ANSWERED leaves, mtpo_trainer.py:2884-2888 — the docstring's
        # greedy-descent wording at 2471-2473 is not what the code does)
        # vs avgAcc (correct terminal leaves / ALL terminal leaves).
        # Persist every step's scalars so the curve can be rendered.
        rl_metrics_path = os.path.join(out_dir, "rl_metrics.jsonl")
        for it in range(rl_steps):
            # 3-5 ops default: with a ~0.9-facts policy, 2-op chains clear
            # the trainer's avgAcc>=0.8 stability skip and would be dropped;
            # a stronger (CHOICE_TARGET) policy may need harder questions —
            # watch the rej_* counters and raise RL_OPS
            batch = [sample_fn(rng, rng.randint(rl_lo, rl_hi))
                     for _ in range(4)]
            m = trainer.train_step(batch)
            with open(rl_metrics_path, "a") as f:
                f.write(json.dumps(
                    {"step": it + 1,
                     **{k: float(v) for k, v in m.items()
                        if isinstance(v, (int, float))},
                     **({"skipped": m["skipped"]} if m.get("skipped")
                        else {})}) + "\n")
            parts = [f"{k}={v:.4g}" for k, v in sorted(m.items())
                     if isinstance(v, (int, float)) and (
                         k.startswith("rej_") or k in (
                             "loss", "value_loss", "value_loss_all_nodes",
                             "policy_loss", "avg_acc", "pass_at_1",
                             "reward_mean"))]
            if m.get("skipped"):
                parts.append(f"skipped={m['skipped']}")
            log(f"[rl {it + 1}/{rl_steps}] " + " ".join(parts))
        log(f"[demo] RL stage done in {time.time() - t0:.0f}s")
        blob = {}
        for name, tree in (("p", trainer.params), ("h", trainer.head)):
            for i, l in enumerate(jax.tree.leaves(tree)):
                blob[f"{name}{i}"] = np.asarray(l.astype(jnp.float32))
        np.savez(rl_ckpt, **blob)

    # ---- stage C: experiments on held-out questions ----
    eval_rng = random.Random(seed + 777)
    n_eval = int(os.getenv("N_EVAL", "24"))
    ev_lo, ev_hi = (int(x) for x in os.getenv("EVAL_OPS", "3,4").split(","))
    questions = [sample_fn(eval_rng, eval_rng.randint(ev_lo, ev_hi))
                 for _ in range(n_eval)]
    sims = [int(s) for s in os.getenv("SIMS", "8,32,128").split(",")]

    # fig4 regime knobs (round 5): the reference claims pruning HELPS
    # when paraphrastic/duplicate branches crowd a small budget
    # (reference agent.py:458-501, assets/fig4_pruning_effect.png) —
    # that regime needs hot sampling + wide breadth + small num_sim so
    # redundant siblings eat simulations. Defaults reproduce the
    # committed runs exactly.
    eval_temp = float(os.getenv("EVAL_TEMP", "1.0"))
    eval_breadth = int(os.getenv("EVAL_BREADTH", "6"))
    fig4_only = bool(os.getenv("FIG4_ONLY"))
    fig4_sim = int(os.getenv("FIG4_SIM", "0"))  # 0 -> derive from SIMS
    fig4_per = int(os.getenv("FIG4_PER", "8"))

    eval_sp = SamplingParams(n=eval_breadth, temperature=eval_temp,
                             top_p=1.0, top_k=0, max_tokens=32)
    # dedicated eval engine sharing the trained arrays: the trainer's is
    # sized for breadth-4 training waves; eval runs 2 leaves x n=6
    from lapha_tpu.engine import Engine

    eval_engine = Engine(
        trainer.params, cfg, tok, max_model_len=args.max_model_len,
        max_batch=2 * eval_breadth, pad_multiple=min(128, args.max_model_len),
        seed=seed, collect_h0=True)

    def make_agent(*, value_trust, num_sim, prune_per, seed):
        a = DemoAgent(
            tokenizer=tok, depth=depth, breadth=eval_breadth,
            output_dir=out_dir, llm=eval_engine,
            max_model_len=args.max_model_len, sampling_params=eval_sp,
            value_fn=trainer.value_fn, reward_fns=[reward],
            c_puct=1.0, v_prior=0.0, value_trust=value_trust,
            num_sim=num_sim, prune_per=prune_per, max_expands=2,
            num_pos_sim=num_sim,  # no early stop: honest sims axis
            leaves_per_sim=2, hid_bank=LatentBank(),
            rng=random.Random(seed))
        return a

    results = {"config": {
        "task": task, "n_params_m": round(n_params / 1e6, 2),
        "fact_acc": fact_acc, "choice_acc": choice_acc,
        "rl_steps": rl_steps, "n_eval": n_eval, "sims": sims,
        "depth": depth, "breadth": eval_breadth, "eval_temp": eval_temp,
        "fig4_sim": fig4_sim or None, "fig4_per": fig4_per,
        "backend": jax.default_backend(),
    }, "arms": {}}

    path = os.path.join(out_dir, "DEMO_SCALING.json")

    def flush():
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    if not fig4_only:
        for ns in sims:
            log(f"[fig3] value-guided num_sim={ns}")
            results["arms"][f"guided_sim{ns}"] = eval_arm(
                questions, make_agent, num_sim=ns, value_trust=1.0,
                prune_per=10**9, seed=seed + ns, grade=grade, log=log)
            flush()
            log(f"[fig3] unguided control num_sim={ns}")
            results["arms"][f"unguided_sim{ns}"] = eval_arm(
                questions, make_agent, num_sim=ns, value_trust=0.0,
                prune_per=10**9, seed=seed + ns, grade=grade, log=log)
            flush()

    prune_sim = fig4_sim or (32 if 32 in sims else sims[len(sims) // 2])
    log(f"[fig4] pruning on (prune_per={fig4_per}) at num_sim={prune_sim}")
    results["arms"]["pruned"] = eval_arm(
        questions, make_agent, num_sim=prune_sim, value_trust=1.0,
        prune_per=fig4_per, seed=seed + 31337, grade=grade, log=log)
    flush()
    if f"guided_sim{prune_sim}" in results["arms"]:
        results["arms"]["unpruned"] = results["arms"][f"guided_sim{prune_sim}"]
    else:
        log(f"[fig4] pruning off at num_sim={prune_sim}")
        results["arms"]["unpruned"] = eval_arm(
            questions, make_agent, num_sim=prune_sim, value_trust=1.0,
            prune_per=10**9, seed=seed + 31337, grade=grade, log=log)
    flush()

    # ---- summary table ----
    log("\n| arm | pass@1 (best-leaf) | value-head top-1 | avg leaf acc "
        "| any-correct | vh-top1 (answered) | avg leaf (answered) |")
    log("|---|---|---|---|---|---|---|")
    for name, recs in results["arms"].items():
        log(f"| {name} | {summarize(recs, 'pass1'):.3f} "
            f"| {summarize(recs, 'vh_top1'):.3f} "
            f"| {summarize(recs, 'avg_leaf'):.3f} "
            f"| {summarize(recs, 'any_correct'):.3f} "
            f"| {summarize(recs, 'vh_top1_ans'):.3f} "
            f"| {summarize(recs, 'avg_ans'):.3f} |")

    flush()
    log(f"[demo] wrote {path}")
    return results


if __name__ == "__main__":
    main()
