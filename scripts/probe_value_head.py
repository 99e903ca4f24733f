#!/usr/bin/env python
"""Diagnose the demo value head: what does v_pred actually correlate with?

demo_scaling run 2 reproduced fig3 (pass@1 0.625 -> 0.958 -> 1.000 over
sims 8/32/128) but NOT fig2: argmax-v_pred leaf accuracy (0.29-0.46) sat
BELOW average leaf accuracy (0.49-0.75) — the head looked anti-correlated
with correctness. This probe resumes the run's trained params
(DEMO_OUT/{sft,rl}_params.npz), replays eval-style searches, and dumps
per-leaf (v_pred, correct, depth, completion_len) with correlations, to
attribute the failure: head-learned-geometry-not-correctness vs a
depth/length confound vs a selection bug.

Usage: DEMO_OUT=/root/repo/demo_out python scripts/probe_value_head.py

TASK=nav (run 3): probes ALL terminal leaves (the nav fig2 population),
grades with the full-chain rule grader, and adds the attribution the nav
task is built around — corr(v_pred, reachable): can the head see whether
the target is still reachable from the leaf's TRUE state within the
remaining step budget (nav_bfs over the visible values)?
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("DEMO_RESUME", "1")

import numpy as np

import demo_scaling as D


def main():
    out_dir = os.getenv("DEMO_OUT", "/root/repo/demo_out")
    assert os.path.exists(os.path.join(out_dir, "rl_params.npz")), \
        "run scripts/demo_scaling.py first"
    import jax
    import jax.numpy as jnp

    from lapha_tpu.engine import Engine, SamplingParams
    from lapha_tpu.models import Qwen2Config, qwen2
    from lapha_tpu.search import LatentBank
    from lapha_tpu.train.config import MTPOConfig
    from lapha_tpu.train.trainer import MTPOTrainer

    seed = int(os.getenv("SEED", "0"))
    task = os.getenv("TASK", "chain")
    tok = D.DemoTok()
    cfg = Qwen2Config(
        vocab_size=((len(tok) + 127) // 128) * 128,
        hidden_size=int(os.getenv("H", "256")),
        intermediate_size=4 * int(os.getenv("H", "256")),
        num_hidden_layers=int(os.getenv("NL", "4")),
        num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=10000.0,
        dtype=jnp.bfloat16)
    params = qwen2.init_params(cfg, jax.random.key(seed))

    def reward(completion, gt):
        m = D._ANS_RE.search(completion or "")
        return float(bool(m) and gt is not None and m.group(1) == str(gt))

    if task == "nav":
        reward = D.reward_nav
    sample_fn = D.sample_question_nav if task == "nav" else D.sample_question

    args = MTPOConfig(
        output_dir=os.path.join(out_dir, "train"),
        depth=6, breadth=4, num_sim=16, num_pos_sim=99, prune_per=8,
        num_groups=8, max_model_len=512, max_prompt_length=384,
        max_completion_length=32, per_device_train_batch_size=4,
        num_generations=4, save_steps=0, bf16=True,
        gradient_checkpointing=False, mesh_model=1, leaves_per_sim=2,
        temperature=1.0, top_k=0, top_p=1.0, learning_rate=2e-4,
        lr_scheduler_type="constant", warmup_ratio=0.0,
        num_trees=8, num_iterations=2, value_trust=0.5, v_prior=0.5,
        seed=seed, debug_print=False)
    trainer = MTPOTrainer(model=(params, cfg), agent_cls_list=[D.DemoAgent],
                          args=args, reward_fns=[reward],
                          train_dataset=[], tokenizer=tok)
    flat = dict(np.load(os.path.join(out_dir, "rl_params.npz")))
    for name, tree in (("p", trainer.params), ("h", trainer.head)):
        leaves, treedef = jax.tree.flatten(tree)
        restored = jax.tree.unflatten(
            treedef, [jnp.asarray(flat[f"{name}{i}"]).astype(l.dtype)
                      for i, l in enumerate(leaves)])
        if name == "p":
            trainer.params = restored
        else:
            trainer.head = restored
    trainer.value_fn.update_params(trainer.params, trainer.head)
    print("[probe] resumed RL params", flush=True)

    eval_engine = Engine(
        trainer.params, cfg, tok, max_model_len=args.max_model_len,
        max_batch=12, pad_multiple=min(128, args.max_model_len),
        seed=seed, collect_h0=True)
    sp = SamplingParams(n=6, temperature=1.0, top_p=1.0, top_k=0,
                        max_tokens=32)

    eval_rng = random.Random(seed + 777)
    questions = [sample_fn(eval_rng, eval_rng.randint(3, 4))
                 for _ in range(int(os.getenv("N_EVAL", "8")))]

    rows = []
    for qi, ex in enumerate(questions):
        agent = D.DemoAgent(
            tokenizer=tok, depth=6, breadth=6, output_dir=out_dir,
            llm=eval_engine, max_model_len=args.max_model_len,
            sampling_params=sp, value_fn=trainer.value_fn,
            reward_fns=[reward], c_puct=1.0, v_prior=0.0, value_trust=1.0,
            num_sim=32, prune_per=10**9, max_expands=2, num_pos_sim=32,
            leaves_per_sim=2, hid_bank=LatentBank(),
            rng=random.Random(seed + 1000 * qi + 31))
        chains = agent.search(question=ex["question"],
                              ground_truth=ex["ground_truth"],
                              support_material_path=None, cot=None)
        seen = set()
        for ch in chains:
            if not ch:
                continue
            leaf = ch[-1]
            if id(leaf) in seen:
                continue
            seen.add(id(leaf))
            m = D._ANS_RE.search(leaf.get("completion") or "")
            if task == "nav":
                valid, cur, steps, ans = D.nav_chain_state(ch, ex)
                gt = int(ex["ground_truth"])
                if ans is not None:
                    reach = float(valid and cur == gt and ans == str(gt))
                else:  # budget left: is the target still reachable?
                    dist, _ = D.nav_bfs(cur, ex["menu"], max(0, 6 - steps))
                    reach = float(valid and gt in dist)
                hid = leaf.get("hid_idx")
                y_lat = (np.asarray(agent.hid_bank.index_select([int(hid)]),
                                    np.float32)[0]
                         if hid is not None and agent.hid_bank is not None
                         else None)
                rows.append(dict(
                    q=qi, correct=D.grade_chain_nav(ch, ex),
                    v=float(leaf.get("v_pred") or 0.0),
                    depth=int(leaf.get("current_depth") or 0),
                    clen=len(leaf.get("completion") or ""),
                    answered=float(bool(m)), reachable=reach,
                    valid=float(valid), y=y_lat))
                continue
            if not m:
                continue
            rows.append(dict(
                q=qi,
                correct=float(m.group(1) == ex["ground_truth"]),
                v=float(leaf.get("v_pred") or 0.0),
                depth=int(leaf.get("current_depth") or 0),
                clen=len(leaf.get("completion") or "")))
        print(f"[probe] q{qi} leaves={len(rows)}", flush=True)

    v = np.array([r["v"] for r in rows])
    c = np.array([r["correct"] for r in rows])
    d = np.array([r["depth"] for r in rows], float)
    ln = np.array([r["clen"] for r in rows], float)

    def corr(a, b):
        if a.std() < 1e-9 or b.std() < 1e-9:
            return float("nan")
        return float(np.corrcoef(a, b)[0, 1])

    print(f"\nleaves={len(rows)}  acc={c.mean():.3f}  "
          f"v mean={v.mean():.4f} std={v.std():.4f}")
    print(f"corr(v, correct) = {corr(v, c):.3f}")
    print(f"corr(v, depth)   = {corr(v, d):.3f}")
    print(f"corr(v, clen)    = {corr(v, ln):.3f}")
    if task == "nav":
        rc = np.array([r["reachable"] for r in rows])
        an = np.array([r["answered"] for r in rows])
        vl = np.array([r["valid"] for r in rows])
        print(f"corr(v, reachable) = {corr(v, rc):.3f}   "
              f"corr(v, answered) = {corr(v, an):.3f}   "
              f"corr(v, valid) = {corr(v, vl):.3f}")
        print(f"reachable rate={rc.mean():.3f} answered rate={an.mean():.3f} "
              f"valid rate={vl.mean():.3f}")
    print(f"v | correct=1: {v[c > 0.5].mean() if (c > 0.5).any() else float('nan'):.4f}"
          f"   v | correct=0: {v[c < 0.5].mean() if (c < 0.5).any() else float('nan'):.4f}")
    # per-question, since V is tree-relative: the cross-question pooling can
    # mask a within-tree signal (or manufacture a fake one)
    wq = []
    for qi in sorted({r["q"] for r in rows}):
        sel = np.array([r["q"] == qi for r in rows])
        if sel.sum() >= 4 and c[sel].std() > 1e-9 and v[sel].std() > 1e-9:
            wq.append(corr(v[sel], c[sel]))
    if wq:
        print(f"within-question corr(v, correct): mean={np.mean(wq):.3f} "
              f"over {len(wq)} questions  {['%.2f' % x for x in wq]}")

    # ---- latent separability probe (round 5): is the signal IN the
    # latent at all? Fit a ridge readout reachable~y on even questions,
    # test on odd. AUC≈0.5 => the pooled latent does not carry the state
    # (scale attribution: nothing downstream could recover it); AUC>>0.5
    # => the representation is sufficient and the value head/targets are
    # what under-deliver (training attribution).
    if task == "nav" and any(r.get("y") is not None for r in rows):
        keep = [r for r in rows if r.get("y") is not None]
        Y = np.stack([r["y"] for r in keep])
        qs = np.array([r["q"] for r in keep])
        mu, sd = Y.mean(0), Y.std(0) + 1e-6
        Yz = (Y - mu) / sd

        def auc(score, lab):
            pos, neg = score[lab > 0.5], score[lab < 0.5]
            if not len(pos) or not len(neg):
                return float("nan")
            return float((pos[:, None] > neg[None, :]).mean()
                         + 0.5 * (pos[:, None] == neg[None, :]).mean())

        def ridge_auc(feat_tr, lab_tr, feat_te, lab_te, lam=10.0):
            A = feat_tr.T @ feat_tr + lam * np.eye(feat_tr.shape[1])
            w = np.linalg.solve(A, feat_tr.T @ (2 * lab_tr - 1))
            return auc(feat_te @ w, lab_te)

        tr, te = qs % 2 == 0, qs % 2 == 1
        for name in ("reachable", "correct", "answered"):
            lab = np.array([r[name] for r in keep])
            if lab[tr].std() < 1e-9 or lab[te].std() < 1e-9:
                print(f"[sep] {name}: degenerate labels, skipped")
                continue
            a_lat = ridge_auc(Yz[tr], lab[tr], Yz[te], lab[te])
            dz = np.array([[r["depth"], r["clen"]] for r in keep], float)
            dz = (dz - dz.mean(0)) / (dz.std(0) + 1e-6)
            a_dep = ridge_auc(dz[tr], lab[tr], dz[te], lab[te], lam=1e-3)
            print(f"[sep] held-out AUC({name}): latent={a_lat:.3f} "
                  f"depth+len-only={a_dep:.3f}  (n_tr={tr.sum()} "
                  f"n_te={te.sum()} base={lab.mean():.3f})")


if __name__ == "__main__":
    main()
