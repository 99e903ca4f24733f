#!/usr/bin/env python
"""Render the three demo-scaling figures from DEMO_SCALING.json.

Counterparts of the reference's headline assets (fig2_pass1_vs_avgacc,
fig3_test_time_scaling, fig4_pruning_effect — reference README.md:48-58)
measured on THIS framework by scripts/demo_scaling.py.

Usage: python scripts/demo_figures.py [path/to/DEMO_SCALING.json] [outdir]

Design follows the dataviz method: one axis per chart, categorical hues
in fixed order from the validated reference palette (blue #2a78d6,
orange #eb6834, aqua #1baf7a on surface #fcfcfb), thin marks, direct
labels, recessive grid.
"""
from __future__ import annotations

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"


def mean(recs, key):
    return sum(r[key] for r in recs) / max(1, len(recs))


def style(ax):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=9)
    ax.yaxis.grid(True, color="#e6e5e0", linewidth=0.8)
    ax.set_axisbelow(True)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/lapha-demo-scaling/DEMO_SCALING.json"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "assets"
    os.makedirs(outdir, exist_ok=True)
    with open(path) as f:
        res = json.load(f)
    arms = res["arms"]
    sims = [s for s in res["config"]["sims"]
            if f"guided_sim{s}" in arms and f"unguided_sim{s}" in arms]

    # ---- fig3: test-time scaling (pass@1 vs num_sim, guided vs control)
    fig, ax = plt.subplots(figsize=(5.2, 3.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    style(ax)
    for name, color, label in (("guided", BLUE, "value-guided"),
                               ("unguided", ORANGE,
                                "no value guidance (control)")):
        ys = [mean(arms[f"{name}_sim{s}"], "pass1") for s in sims]
        ax.plot(sims, ys, color=color, linewidth=2, marker="o",
                markersize=5, label=label)
        ax.annotate(f"{ys[-1]:.2f}", (sims[-1], ys[-1]), xytext=(6, 0),
                    textcoords="offset points", color=INK, fontsize=9,
                    va="center")
    ax.set_xscale("log", base=2)
    ax.set_xticks(sims)
    ax.set_xticklabels([str(s) for s in sims])
    ax.set_ylim(0, 1.02)
    ax.set_xlabel("MCTS simulations (num_sim)", color=INK2, fontsize=9)
    ax.set_ylabel("pass@1 (best-leaf selection)", color=INK2, fontsize=9)
    ax.set_title("Value-guided test-time scaling", color=INK, fontsize=11,
                 loc="left")
    ax.legend(frameon=False, fontsize=8, loc="upper left",
              labelcolor=INK2)
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "demo_fig3_test_time_scaling.png"),
                facecolor=SURFACE)

    # ---- fig2: value-head top-1 vs average leaf accuracy
    fig, ax = plt.subplots(figsize=(5.2, 3.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    style(ax)
    x = range(len(sims))
    w = 0.38
    vh = [mean(arms[f"guided_sim{s}"], "vh_top1") for s in sims]
    al = [mean(arms[f"guided_sim{s}"], "avg_leaf") for s in sims]
    leaf_pop = ("average terminal leaf"
                if res["config"].get("task") == "nav"
                else "average answered leaf")
    b1 = ax.bar([i - w / 2 for i in x], vh, width=w - 0.04, color=BLUE,
                label="value-head top-1 leaf")
    b2 = ax.bar([i + w / 2 for i in x], al, width=w - 0.04, color=ORANGE,
                label=leaf_pop)
    for bars in (b1, b2):
        for b in bars:
            ax.annotate(f"{b.get_height():.2f}",
                        (b.get_x() + b.get_width() / 2, b.get_height()),
                        ha="center", va="bottom", fontsize=8, color=INK)
    ax.set_xticks(list(x))
    ax.set_xticklabels([f"num_sim={s}" for s in sims])
    ax.set_ylim(0, max(vh + al + [0.1]) * 1.25)
    ax.set_ylabel("accuracy", color=INK2, fontsize=9)
    ax.set_title("Value head beats the average leaf", color=INK,
                 fontsize=11, loc="left")
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2)
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "demo_fig2_valuehead_vs_avgleaf.png"),
                facecolor=SURFACE)

    # ---- fig4: pruning effect at fixed budget
    if "pruned" in arms and "unpruned" in arms:
        fig, ax = plt.subplots(figsize=(4.2, 3.2), dpi=160)
        fig.patch.set_facecolor(SURFACE)
        style(ax)
        keys = ("pass1", "vh_top1", "any_correct")
        names = ("pass@1", "value-head top-1", "any correct leaf")
        xs = range(len(keys))
        pv = [mean(arms["pruned"], k) for k in keys]
        uv = [mean(arms["unpruned"], k) for k in keys]
        w = 0.38
        b1 = ax.bar([i - w / 2 for i in xs], pv, width=w - 0.04,
                    color=AQUA, label="pruning on (prune_per=8)")
        b2 = ax.bar([i + w / 2 for i in xs], uv, width=w - 0.04,
                    color=ORANGE, label="pruning off")
        for bars in (b1, b2):
            for b in bars:
                ax.annotate(f"{b.get_height():.2f}",
                            (b.get_x() + b.get_width() / 2,
                             b.get_height()),
                            ha="center", va="bottom", fontsize=8,
                            color=INK)
        ax.set_xticks(list(xs))
        ax.set_xticklabels(names, fontsize=8)
        ax.set_ylim(0, 1.1)
        ax.set_title("Latent-space pruning at a fixed search budget",
                     color=INK, fontsize=11, loc="left")
        ax.legend(frameon=False, fontsize=8, labelcolor=INK2)
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, "demo_fig4_pruning_effect.png"),
                    facecolor=SURFACE)

    # ---- fig2 (training-time): pass@1 vs avgAcc per RL step — the
    # reference's actual fig2_pass1_vs_avgacc curve (README.md:54-58):
    # pass@1 = argmax-v_pred over ANSWERED leaves of each training tree
    # (mtpo_trainer.py:2884-2888), avgAcc = correct terminal leaves /
    # ALL terminal leaves. Rendered when the run recorded rl_metrics.jsonl.
    rl_path = os.path.join(os.path.dirname(os.path.abspath(path)),
                           "rl_metrics.jsonl")
    if os.path.exists(rl_path):
        steps, p1, aa = [], [], []
        with open(rl_path) as f:
            for line in f:
                m = json.loads(line)
                if "pass_at_1" in m and "avg_acc" in m:
                    steps.append(int(m["step"]))
                    p1.append(float(m["pass_at_1"]))
                    aa.append(float(m["avg_acc"]))
        if steps:
            fig, ax = plt.subplots(figsize=(5.2, 3.4), dpi=160)
            fig.patch.set_facecolor(SURFACE)
            style(ax)
            ax.plot(steps, p1, color=BLUE, linewidth=1.2, alpha=0.45)
            ax.plot(steps, aa, color=ORANGE, linewidth=1.2, alpha=0.45)

            def runmean(ys, k=5):
                out = []
                for i in range(len(ys)):
                    lo = max(0, i - k + 1)
                    out.append(sum(ys[lo:i + 1]) / (i + 1 - lo))
                return out

            ax.plot(steps, runmean(p1), color=BLUE, linewidth=2.2,
                    label="pass@1 (value-head top-1, answered leaves)")
            ax.plot(steps, runmean(aa), color=ORANGE, linewidth=2.2,
                    label="avgAcc (all terminal leaves)")
            ax.set_ylim(0, 1.02)
            ax.set_xlabel("MTPO training step", color=INK2, fontsize=9)
            ax.set_ylabel("accuracy on training trees", color=INK2,
                          fontsize=9)
            ax.set_title("Training-time top-1 selection vs average leaf",
                         color=INK, fontsize=11, loc="left")
            ax.legend(frameon=False, fontsize=8, labelcolor=INK2)
            fig.tight_layout()
            fig.savefig(os.path.join(outdir,
                                     "demo_fig2_pass1_vs_avgacc.png"),
                        facecolor=SURFACE)

    print(f"figures written to {outdir}/")


if __name__ == "__main__":
    main()
