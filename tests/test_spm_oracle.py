"""Cross-implementation check of the from-scratch SentencePiece codec.

The real paligemma_tokenizer.model is unavailable offline (byte-parity vs
sentencepiece stays env-gated in test_tokenizer.py), but HuggingFace
``tokenizers.models.Unigram`` implements the same Viterbi segmentation and
ships in this image — an INDEPENDENT oracle. We build one vocabulary
(random multi-char pieces with distinct random scores + full single-char
coverage), load it into both our ``SentencePieceProcessor`` (via a
fabricated .model protobuf, exercising the protobuf parser too) and the HF
Unigram model, and require identical segmentations over a corpus.
"""

import numpy as np
import pytest

from lap_tpu.models import spm

tokenizers = pytest.importorskip("tokenizers")

SPACE = "▁"


def _build_vocab(rng) -> list[tuple[str, float]]:
    alphabet = "abcdefghij "
    pieces: dict[str, float] = {"<unk>": 0.0}
    # full single-char coverage (no unknowns in the corpus)
    for ch in alphabet:
        c = SPACE if ch == " " else ch
        pieces[c] = float(-10.0 - rng.uniform(0, 0.5))
    # random multi-char pieces, some with the word-boundary marker
    for _ in range(160):
        n = int(rng.integers(2, 5))
        word = "".join(rng.choice(list("abcdefghij"), size=n))
        if rng.random() < 0.4:
            word = SPACE + word
        if word not in pieces:
            pieces[word] = float(-rng.uniform(0.5, 9.0))
    return list(pieces.items())


def _corpus(rng) -> list[str]:
    words = ["abba", "fed", "jig", "ghee", "cab", "idea", "badge", "hij", "a", "dig"]
    out = []
    for _ in range(40):
        k = int(rng.integers(1, 6))
        out.append(" ".join(rng.choice(words, size=k)))
    out += ["", "a", "aaaaaaaaaa", "abcdefghij " * 3]
    return out


def test_unigram_viterbi_matches_hf_tokenizers():
    rng = np.random.default_rng(4)
    vocab = _build_vocab(rng)

    # ours: via the fabricated .model protobuf (parser + normalizer + viterbi)
    proto = spm.build_model_proto(
        [("<unk>", 0.0, spm.UNKNOWN)]
        + [(p, s, spm.NORMAL) for p, s in vocab if p != "<unk>"],
        model_type=1,
        unk_id=0,
        byte_fallback=False,
        add_dummy_prefix=True,
    )
    mine = spm.SentencePieceProcessor(model_proto=proto)

    hf = tokenizers.Tokenizer(tokenizers.models.Unigram(vocab, unk_id=0, byte_fallback=False))

    for text in _corpus(rng):
        # normalize exactly like sentencepiece: collapse whitespace, dummy
        # prefix, word-boundary substitution — then hand BOTH the same string
        norm = " ".join(text.split())
        norm = (" " + norm).replace(" ", SPACE)
        ours = [mine.id_to_piece(i) for i in mine.encode(text)]
        theirs = [t for t in hf.encode(norm).tokens]
        assert ours == theirs, f"{text!r}: {ours} != {theirs}"


def test_unigram_viterbi_native_matches_python():
    """The C++ Viterbi hot loop must agree with the pure-Python fallback."""
    rng = np.random.default_rng(5)
    vocab = _build_vocab(rng)
    proto = spm.build_model_proto(
        [("<unk>", 0.0, spm.UNKNOWN)]
        + [(p, s, spm.NORMAL) for p, s in vocab if p != "<unk>"],
        model_type=1,
        unk_id=0,
        byte_fallback=False,
        add_dummy_prefix=True,
    )
    a = spm.SentencePieceProcessor(model_proto=proto)
    if a._native is None:
        pytest.skip("native lib unavailable")
    b = spm.SentencePieceProcessor(model_proto=proto)
    b._native = None
    for text in _corpus(rng):
        assert a.encode(text) == b.encode(text), text
