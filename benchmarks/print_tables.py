"""Format benchmarks/results/ JSONs as markdown tables.

Equivalent of the reference's benchmarks/print_tables.py:23-69: one table per
model, one row per mode, score + eval-time columns per task — so our numbers
line up against BASELINE.md directly.
"""
from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

RESULTS = Path(__file__).parent / "results"
TASKS = ("STSBenchmark", "EmotionClassification", "SyntheticRetrieval")
MODE_ORDER = ("f32", "f16", "q4_0", "q4_1", "q8_0", "gguf", "sbert",
              "sbert-batchless")


def collect():
    models = defaultdict(dict)
    for d in sorted(RESULTS.iterdir()) if RESULTS.exists() else []:
        if not d.is_dir() or "_" not in d.name:
            continue
        # mode is a known suffix (q4_0 etc. contain underscores themselves)
        for mode in sorted(MODE_ORDER, key=len, reverse=True):
            if d.name.endswith(f"_{mode}"):
                model = d.name[: -len(mode) - 1]
                break
        else:
            model, _, mode = d.name.rpartition("_")
        for f in d.glob("*.json"):
            data = json.loads(f.read_text())
            test = data.get("test", {})
            score = test.get("cos_sim", {}).get("spearman", test.get("main_score"))
            models[model].setdefault(mode, {})[f.stem] = (
                score,
                test.get("evaluation_time"),
            )
    return models


def main() -> None:
    models = collect()
    if not models:
        print("no results in", RESULTS)
        return
    for model, modes in models.items():
        print(f"\n### {model}\n")
        header = "| mode |"
        sep = "|---|"
        for t in TASKS:
            header += f" {t} score | {t} time (s) |"
            sep += "---|---|"
        print(header)
        print(sep)
        ordered = sorted(
            modes,
            key=lambda m: MODE_ORDER.index(m) if m in MODE_ORDER else 99,
        )
        for mode in ordered:
            row = f"| {mode} |"
            for t in TASKS:
                if t in modes[mode]:
                    score, tm = modes[mode][t]
                    row += f" {score:.4f} | {tm} |"
                else:
                    row += " - | - |"
            print(row)


if __name__ == "__main__":
    main()
