"""Summarize ref_eval_results.jsonl: per (harness, model, env, delay) mean
return + normalized score using the run's OWN oracle/random controls
(normalized = 100 * (r - random) / (oracle - random), the reference's
convention in process_results/plot_util.py)."""

import json
import sys
from collections import defaultdict
from pathlib import Path

path = sys.argv[1] if len(sys.argv) > 1 else str(
    Path(__file__).with_name("ref_eval_results.jsonl")
)
rows = [json.loads(line) for line in open(path) if line.strip()]
by = defaultdict(list)
for r in rows:
    by[(r["harness"], r["model_name"], r["env_name"], r["delay"])].append(
        r["total_reward"]
    )

for (harness, model, env, delay), vals in sorted(by.items()):
    mean = sum(vals) / len(vals)
    key_o = (harness, "oracle", env, delay)
    key_r = (harness, "random", env, delay)
    norm = ""
    if key_o in by and key_r in by and model not in ("oracle", "random"):
        o = sum(by[key_o]) / len(by[key_o])
        rnd = sum(by[key_r]) / len(by[key_r])
        norm = f"  norm={100 * (mean - rnd) / (o - rnd):.1f}"
    print(f"{harness:9s} {model:14s} {env:15s} d{delay} n={len(vals):2d} "
          f"mean={mean:9.2f}{norm}")
