#!/usr/bin/env python
"""Populate data/ with the five eval benchmark JSONLs.

The benchmark rows are public data (`{"question": ..., "answer": ...}` per
line — aime-24/25, math-500, gaokao-23, olympiad). This repo does not vendor
them; point --source at any LaPha checkout or dataset dump that has them.

Usage: python scripts/fetch_eval_data.py --source /path/to/LaPha/data
"""

import argparse
import json
import os
import shutil

FILES = ["aime-24.jsonl", "aime-25.jsonl", "math-500.jsonl", "gaokao-23.jsonl", "olympiad.jsonl"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="directory containing the benchmark jsonl files")
    ap.add_argument("--dest", default=os.path.join(os.path.dirname(__file__), "..", "data"))
    args = ap.parse_args()

    os.makedirs(args.dest, exist_ok=True)
    for name in FILES:
        src = os.path.join(args.source, name)
        if not os.path.exists(src):
            print(f"skip (missing): {src}")
            continue
        # validate format before copying
        with open(src, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if line.strip():
                    row = json.loads(line)
                    assert "question" in row and "answer" in row, f"{name}:{i} bad row"
        shutil.copy(src, os.path.join(args.dest, name))
        print(f"copied {name}")


if __name__ == "__main__":
    main()
