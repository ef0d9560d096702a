"""Record CLIP-BPE token-id goldens by replaying the reference tokenizer.

Same methodology as make_tracker_fixture.py used for OC-SORT: the reference
implementation (utils/clip_tokenizer.py:197-288, pure Python + the public
vocab gz) is run ONCE as the oracle over a broad corpus and the ids are
committed as a fixture; tests/test_tokenizer_golden.py then asserts our
clean-room BPE (clearcam_tpu/utils/tokenizer.py) matches exactly.

Usage (needs the reference snapshot or any open_clip checkout on disk):
    python tests/make_tokenizer_fixture.py [ref_dir] [out.json]
"""
from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else
           Path(__file__).parent / "fixtures" / "clip_tokens_golden.json")

# Broad corpus: contractions, case folding, html entities, unicode letters /
# digits / emoji / CJK, punctuation runs, whitespace soup, long merges.
CORPUS = [
    "ferrari f40",
    "a photo of a cat",
    "A PHOTO OF A DOG!!!",
    "person walking a bicycle",
    "it's we're they've i'm you'll he'd don't",
    "state-of-the-art object-detection (2024)",
    "hello,   world...   spaces\tand\nnewlines",
    "café naïve résumé über straße",
    "&amp;amp; &lt;tag&gt; &quot;quoted&quot;",
    "12345 67 8 9.0 3,000,000",
    "тест кириллица",
    "日本語のテスト",
    "中文测试文本",
    "한국어 테스트",
    "emoji \U0001f600 \U0001f697 \U0001f525 test",
    "mixed123abc456def",
    "snake_case_identifier and camelCaseIdentifier",
    "http://example.com/path?query=1&x=2",
    "user@example.com",
    "C++ C# F# .NET node.js",
    "''''''''",
    "a",
    "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz",
    "the quick brown fox jumps over the lazy dog",
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
    "antidisestablishmentarianism pneumonoultramicroscopicsilicovolcanoconiosis",
    "  leading and trailing whitespace  ",
    "tab\tseparated\tvalues",
    "hyphen-ated multi-word-compound",
    "$100.00 50% #1 @home ~tilde `backtick`",
    "¿qué pasa? ¡hola!",
    "αβγ δεζ greek letters",
    "שלום hebrew",
    "مرحبا arabic",
    "a photo of a red car parked outside a house at night",
    "surveillance camera footage of a person in a hoodie",
    "delivery truck reversing into a driveway",
    "two dogs playing in the garden",
    "man's best friend",
    "o'clock o'brien d'angelo",
    "reëntry coöperation",
    "—em—dash–en–dash…ellipsis…",
    "quotes “curly” ‘single’ «guillemets»",
    "math: 2+2=4, 10/5=2, 3*3=9",
    "deep learning & computer vision",
    "",
]


def main():
    spec = importlib.util.spec_from_file_location(
        "ref_clip_tokenizer", REF / "utils" / "clip_tokenizer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tok = mod._tokenizer
    golden = {"sot_id": tok.sot_token_id, "eot_id": tok.eot_token_id,
              "vocab_size": tok.vocab_size,
              "cases": [{"text": t, "ids": tok.encode(t)} for t in CORPUS]}
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(golden, ensure_ascii=False, indent=1))
    n = sum(len(c["ids"]) for c in golden["cases"])
    print(f"recorded {len(CORPUS)} cases, {n} token ids -> {OUT}")


if __name__ == "__main__":
    main()
