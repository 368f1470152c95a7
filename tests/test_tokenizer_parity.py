"""Tokenizer parity: our SimpleTokenizer must produce ids identical to CLIP's.

The real ``bpe_simple_vocab_16e6.txt.gz`` is a model asset that may be absent in
offline environments, so parity is established two ways:

1. Algorithm parity vs HuggingFace's independent ``CLIPTokenizer``
   implementation, on a synthetic vocab written in the exact upstream file
   formats — covers splitting regex, byte-encoding, BPE merge order, specials,
   lowercasing, whitespace cleaning, and truncation.
2. Golden ids vs the REAL asset (skipped unless $PIXRAY_TPU_BPE or
   models/bpe_simple_vocab_16e6.txt.gz is present) — the contract is the
   reference's clip-package tokenizer (/root/reference/slip.py:77-82).
"""

import gzip
import json
import os

import numpy as np
import pytest

from pixray_tpu.models.clip.tokenizer import (
    SimpleTokenizer,
    bytes_to_unicode,
    find_bpe_vocab,
    tokenize,
)

MERGES = [
    ("h", "e"),
    ("l", "o</w>"),
    ("e", "l"),
    ("t", "h"),
    ("th", "e</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("he", "l"),
    ("hel", "lo</w>"),
    ("1", "2"),
    (".", "."),
    ("..", ".</w>"),
    ("'", "s</w>"),
]

FIXTURES = [
    "hello the cat",
    "a cat!",
    "THE   Cat's    hello",
    "cats 12 123 catcat",
    "hello, world... (hello)",
    "héllo naïve café",  # accented letters exercise \p{L}
    # NOTE: no CJK here — HF's slow CLIPTokenizer WITHOUT ftfy routes through
    # BasicTokenizer, which space-splits CJK chars; openai's tokenizer (and
    # ours) groups them under \p{L}+.  With ftfy installed HF matches openai.
    "emoji \U0001f600 and ½ fractions",
    "don't you've we'll i'm they're it'd",
    "",
    "a",
    " padded   whitespace\t\tand\nnewlines ",
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    """Write the synthetic vocab in BOTH upstream file formats."""
    d = tmp_path_factory.mktemp("vocab")

    # openai format: gzip, header line, space-separated merges
    bpe_path = d / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(bpe_path, "wt", encoding="utf-8") as f:
        f.write("bpe_simple_vocab_16e6\n")
        for a, b in MERGES:
            f.write(f"{a} {b}\n")

    # HF format: vocab.json (token -> id, SAME construction) + merges.txt
    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for a, b in MERGES:
        vocab.append(a + b)
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    (d / "vocab.json").write_text(json.dumps({t: i for i, t in enumerate(vocab)}))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n"
    )
    return d


class TestAlgorithmParityVsHF:
    def test_ids_match_hf_cliptokenizer(self, vocab_files):
        transformers = pytest.importorskip("transformers")
        hf = transformers.CLIPTokenizer(
            vocab_file=str(vocab_files / "vocab.json"),
            merges_file=str(vocab_files / "merges.txt"),
        )
        ours = SimpleTokenizer(bpe_path=str(vocab_files / "bpe_simple_vocab_16e6.txt.gz"))
        assert not ours.degraded

        for text in FIXTURES:
            hf_ids = hf(text)["input_ids"]
            our_ids = [ours.sot_token] + ours.encode(text) + [ours.eot_token]
            assert our_ids == hf_ids, f"mismatch on {text!r}: {our_ids} vs {hf_ids}"

    def test_specials_and_roundtrip(self, vocab_files):
        ours = SimpleTokenizer(bpe_path=str(vocab_files / "bpe_simple_vocab_16e6.txt.gz"))
        n_base = 2 * 256 + len(MERGES)
        assert ours.sot_token == n_base
        assert ours.eot_token == n_base + 1
        ids = ours.encode("hello the cat")
        assert ours.decode(ids).strip() == "hello the cat"

    def test_padded_array_and_truncation(self, vocab_files, monkeypatch):
        import pixray_tpu.models.clip.tokenizer as T

        ours = SimpleTokenizer(bpe_path=str(vocab_files / "bpe_simple_vocab_16e6.txt.gz"))
        monkeypatch.setattr(T, "_default_tokenizer", ours)

        arr = tokenize(["hello cat", "the"], context_length=8)
        assert arr.shape == (2, 8) and arr.dtype == np.int32
        assert arr[0, 0] == ours.sot_token
        row = arr[0][arr[0] != 0]
        assert row[-1] == ours.eot_token

        long = tokenize("cat " * 50, context_length=8, truncate=True)
        assert long.shape == (1, 8)
        assert long[0, -1] == ours.eot_token  # eot forced at the boundary
        with pytest.raises(RuntimeError):
            tokenize("cat " * 50, context_length=8, truncate=False)


class TestGoldenVsRealAsset:
    def test_known_openai_ids(self):
        path = find_bpe_vocab()
        if path is None:
            pytest.skip("real bpe_simple_vocab_16e6.txt.gz not available offline")
        ours = SimpleTokenizer(bpe_path=path)
        # ids recorded from openai/CLIP's tokenizer
        assert [ours.sot_token] + ours.encode("a photo of a cat") + [ours.eot_token] == [
            49406, 320, 1125, 539, 320, 2368, 49407,
        ]
        assert ours.sot_token == 49406 and ours.eot_token == 49407


class TestFailLoudOnRealWeights:
    def test_degraded_tokenizer_plus_real_ckpt_raises(self, monkeypatch):
        from pixray_tpu.models.perceptor import Perceptor

        monkeypatch.delenv("PIXRAY_TPU_ALLOW_DEGRADED_TOKENIZER", raising=False)
        import pixray_tpu.models.clip.tokenizer as T

        monkeypatch.setattr(T, "_default_tokenizer", None)
        if find_bpe_vocab() is not None:
            pytest.skip("real vocab present — degraded mode unreachable")
        with pytest.raises(RuntimeError, match="BPE vocab"):
            Perceptor._require_checkpoint_tokenizer("ViT-B/32")

    def test_override_env_allows(self, monkeypatch):
        from pixray_tpu.models.perceptor import Perceptor

        monkeypatch.setenv("PIXRAY_TPU_ALLOW_DEGRADED_TOKENIZER", "1")
        import pixray_tpu.models.clip.tokenizer as T

        monkeypatch.setattr(T, "_default_tokenizer", None)
        Perceptor._require_checkpoint_tokenizer("ViT-B/32")  # no raise
