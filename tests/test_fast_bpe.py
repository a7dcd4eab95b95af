"""FAST learned-BPE stage (reference tokenizer.py:563-584 loads the
physical-intelligence/fast HF processor; lap_tpu/models/bpe.py implements
the codec natively)."""

import json

import numpy as np
import pytest

from lap_tpu.models.bpe import IntBPE
from lap_tpu.models.fast_tokenizer import FASTActionCodec, FASTTokenizer


def _corpus(rng, n=64, lo=0, hi=16, length=24):
    # repetitive, low-entropy streams (like quantized DCT tails of zeros)
    out = []
    for _ in range(n):
        seq = rng.integers(lo, hi, size=length).tolist()
        seq[length // 2 :] = [lo] * (length - length // 2)
        out.append(seq)
    return out


def test_bpe_train_roundtrip_identity():
    rng = np.random.default_rng(0)
    corpus = _corpus(rng)
    bpe = IntBPE.train(corpus, alphabet_size=16, num_merges=40)
    assert len(bpe.merges) > 0
    for seq in corpus[:16]:
        enc = bpe.encode(seq)
        assert bpe.decode(enc) == seq
        assert len(enc) < len(seq)  # zeros tail must compress


def test_bpe_handles_unseen_sequences():
    rng = np.random.default_rng(1)
    bpe = IntBPE.train(_corpus(rng), alphabet_size=16, num_merges=30)
    fresh = rng.integers(0, 16, size=50).tolist()
    assert bpe.decode(bpe.encode(fresh)) == fresh
    assert bpe.encode([]) == []
    assert bpe.encode([7]) == [7]


def test_bpe_training_is_deterministic():
    corpus = _corpus(np.random.default_rng(2))
    a = IntBPE.train(corpus, alphabet_size=16, num_merges=25)
    b = IntBPE.train(corpus, alphabet_size=16, num_merges=25)
    assert a.merges == b.merges


def test_bpe_save_load(tmp_path):
    bpe = IntBPE.train(_corpus(np.random.default_rng(3)), alphabet_size=16, num_merges=20)
    path = tmp_path / "fast_bpe.json"
    bpe.save(path)
    loaded = IntBPE.load(path)
    seq = list(range(16)) + [0] * 16
    assert loaded.encode(seq) == bpe.encode(seq)
    assert loaded.vocab_size == bpe.vocab_size


def test_bpe_from_hf_export(tmp_path):
    """A GPT-2-style tokenizer.json (single-char alphabet + merges) loads
    into the same id space: alphabet first, merged ids by rank."""
    vocab = {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}
    merges = ["a b", "ab c"]
    (tmp_path / "tokenizer.json").write_text(
        json.dumps({"model": {"vocab": vocab, "merges": merges}})
    )
    bpe = IntBPE.from_hf_export(tmp_path)
    assert bpe.alphabet_size == 3
    assert bpe.merges == [(0, 1), (3, 2)]
    # "a b c" -> ab c -> abc : single merged token id 3+1=4
    assert bpe.encode([0, 1, 2]) == [4]
    assert bpe.decode([4]) == [0, 1, 2]


def test_fast_codec_with_bpe_roundtrip():
    h, d = 8, 7
    rng = np.random.default_rng(4)
    codec_plain = FASTActionCodec(num_bins=256, scale=32.0)
    # train BPE on the quantized streams of a small action corpus
    corpus = [
        codec_plain.quantize(np.tanh(rng.normal(size=(h, d)) * 0.3)) for _ in range(48)
    ]
    bpe = IntBPE.train(corpus, alphabet_size=256, num_merges=64)
    codec = FASTActionCodec(num_bins=256, scale=32.0, bpe=bpe)
    assert codec.vocab_size == 256 + len(bpe.merges)

    actions = np.tanh(rng.normal(size=(h, d)) * 0.3).astype(np.float32)
    toks = codec.encode(actions)
    assert len(toks) <= h * d
    rec = codec.decode(toks, action_horizon=h, action_dim=d)
    np.testing.assert_allclose(rec, actions, atol=1.0 / 32.0)
    # BPE stage must be lossless: identical to the no-BPE reconstruction
    rec_plain = codec_plain.decode(
        codec_plain.encode(actions), action_horizon=h, action_dim=d
    )
    np.testing.assert_array_equal(rec, rec_plain)


def test_fast_tokenizer_extract_actions_with_bpe():
    h, d = 4, 7
    rng = np.random.default_rng(5)
    plain = FASTActionCodec(num_bins=128, scale=16.0)
    corpus = [plain.quantize(np.tanh(rng.normal(size=(h, d)))) for _ in range(32)]
    bpe = IntBPE.train(corpus, alphabet_size=128, num_merges=32)
    tok = FASTTokenizer(max_len=220, codec=FASTActionCodec(num_bins=128, scale=16.0, bpe=bpe))
    # the offline fallback vocab has only ~153 ids, which would alias the
    # action-token tail onto prompt ids; pretend it is PaliGemma-sized (the
    # id mapping itself is pure arithmetic on vocab_size)
    tok._tokenizer.vocab_size = lambda: 257152

    actions = np.tanh(rng.normal(size=(h, d))).astype(np.float32)
    state = np.zeros(7, np.float32)
    tokens, attn, action_mask, loss_mask = tok.tokenize_with_actions(
        "pick up the block", state, actions
    )
    assert action_mask.any()
    rec = tok.extract_actions(tokens[attn], h, d)
    np.testing.assert_allclose(rec, actions, atol=1.0 / 16.0)


@pytest.mark.skipif(
    "LAP_TPU_FAST_PROCESSOR_DIR" not in __import__("os").environ,
    reason="no physical-intelligence/fast export in image (set LAP_TPU_FAST_PROCESSOR_DIR)",
)
def test_fast_bpe_matches_released_processor():
    """Byte-compatibility with a real released export, when one is present."""
    import os

    from transformers import AutoProcessor

    path = os.environ["LAP_TPU_FAST_PROCESSOR_DIR"]
    hf = AutoProcessor.from_pretrained(path, trust_remote_code=True)
    bpe = IntBPE.from_hf_export(path)
    rng = np.random.default_rng(6)
    actions = np.tanh(rng.normal(size=(1, 8, 7))).astype(np.float32)
    ours = FASTActionCodec(num_bins=bpe.alphabet_size, bpe=bpe).encode(actions[0])
    theirs = hf(actions)[0]
    assert list(ours) == list(theirs)


def test_bpe_export_roundtrip(tmp_path):
    """to_hf_export emits the tokenizer.json shape from_hf_export consumes:
    emit -> load -> identical alphabet/merges and identical encodings."""
    rng = np.random.default_rng(11)
    bpe = IntBPE.train(_corpus(rng), alphabet_size=16, num_merges=30)
    bpe.to_hf_export(tmp_path)
    loaded = IntBPE.from_hf_export(tmp_path)
    assert loaded.alphabet_size == bpe.alphabet_size
    assert loaded.merges == bpe.merges
    for seq in _corpus(rng, n=8):
        assert loaded.encode(seq) == bpe.encode(seq)


def test_bpe_native_matches_python():
    """The C++ encode kernel must reproduce the Python reference exactly
    (including overlapping-pair and repeated-symbol cases)."""
    pytest.importorskip("lap_tpu.native")
    from lap_tpu.native import NativeIntBPE, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    bpe = IntBPE.train(_corpus(rng, n=96, length=48), alphabet_size=16, num_merges=60)
    native = NativeIntBPE(bpe.merges, bpe.alphabet_size)
    cases = _corpus(rng, n=32, length=48) + [
        [], [3], [0, 0], [0] * 40, [1, 1, 1, 1, 1], list(range(16)) * 4,
    ]
    for seq in cases:
        assert native.encode(seq) == bpe.encode_py(seq), seq
    # and the IntBPE front door routes through the same result
    for seq in cases:
        assert bpe.encode(seq) == bpe.encode_py(seq)


def test_bpe_duplicate_merge_pair_keeps_last_rank():
    """A duplicated merges entry (possible in a hand-edited or buggy export;
    from_hf_export does not dedup) must resolve identically in Python and
    C++: the LAST rank wins (dict-comprehension semantics)."""
    bpe = IntBPE(alphabet_size=4, merges=[(0, 1), (0, 1)])
    assert bpe.encode_py([0, 1, 2]) == [5, 2]
    assert bpe.encode([0, 1, 2]) == bpe.encode_py([0, 1, 2])
