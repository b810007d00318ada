"""CLI: summarize a results JSONL file into the normalized-return table.

    python -m neurallaplacecontrol_tpu.results.summarize logs/results.jsonl
"""

import json
import sys

from .process import latex_table, normalized_scores


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "logs/results.jsonl"
    with open(path) as f:
        records = [json.loads(line) for line in f if line.strip()]
    records = [r for r in records if not r.get("errored")]
    for key, (mean, std, n) in sorted(normalized_scores(records).items()):
        print(f"delay={key[0]} {key[1]:18s} {key[2]:12s} {mean:7.1f} +/- {std:5.1f} (n={n})")
    print()
    print(latex_table(records))


if __name__ == "__main__":
    main()
