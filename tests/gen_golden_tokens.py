"""Regenerate the committed tokenizer golden fixtures.

Writes two files next to this script:

- ``golden_tokenizer.json`` — the synthetic 1000-token WordPiece
  tokenizer.json blob (tokenizer/testvocab.py serialized via the HF
  `tokenizers` library, the same engine the reference links through
  tokenizers-cpp).
- ``golden_tokens.json`` — expected token ids for every tests/corpus.py
  input against that blob, produced by the HF backend and cross-checked
  against the pure-Python engine at generation time.

The committed copies make tokenizer regressions deterministic: the golden
test (test_tokenizer.py::test_committed_golden_ids) needs neither the HF
package nor a real model file, unlike the reference's golden gate which
requires a converted bert-base model on disk (examples/test_tokenizer.cpp:57).

Run only when the corpus or the synthetic vocab intentionally changes:

    python tests/gen_golden_tokens.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))


def main() -> None:
    from corpus import FUZZ_CORPUS

    from embedding_cpp_tpu.tokenizer import load_tokenizer
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    blob = build_tokenizer_json(1000)
    (HERE / "golden_tokenizer.json").write_bytes(
        blob if isinstance(blob, bytes) else blob.encode("utf-8")
    )

    hf = load_tokenizer(blob, "hf")
    py = load_tokenizer(blob, "python")
    entries = []
    for text in FUZZ_CORPUS:
        ids = hf.encode(text)
        assert py.encode(text) == ids, f"python backend mismatch on {text!r}"
        entries.append({"text": text, "ids": ids})
    out = {
        "_comment": "Golden WordPiece ids for tests/corpus.py inputs against "
                    "tests/golden_tokenizer.json, generated from the HF "
                    "`tokenizers` backend. Regenerate: "
                    "python tests/gen_golden_tokens.py",
        "n_vocab": 1000,
        "entries": entries,
    }
    (HERE / "golden_tokens.json").write_text(
        json.dumps(out, indent=1, ensure_ascii=False)
    )
    print(f"wrote {len(entries)} golden entries + tokenizer blob")


if __name__ == "__main__":
    main()
