import numpy as np
import pytest

from lap_tpu.models import spm
from lap_tpu.models.prompts import (
    LAP_PROMPT_FORMAT,
    StateDiscretizationConfig,
    is_critical_directional,
    is_direction_natural,
    is_number,
)
from lap_tpu.models.tokenizer import Gemma3Tokenizer, PaligemmaTokenizer
from lap_tpu.models.tokenizer import (
    GEMMA3_BEGIN_IMAGE_TOKEN,
    GEMMA3_IMAGE_TOKEN,
    GEMMA3_BOS_TOKEN,
)


def test_spm_roundtrip_unigram():
    sp = spm.build_test_processor()
    ids = sp.encode("move forward 5 cm", add_bos=True, add_eos=True)
    assert ids[0] == sp.bos_id() and ids[-1] == sp.eos_id()
    assert sp.decode(ids) == "move forward 5 cm"


def test_spm_bpe_merges():
    # Hand-built BPE model: chars a, b + merged pieces.
    pieces = [
        ("<unk>", 0.0, spm.UNKNOWN),
        ("<s>", 0.0, spm.CONTROL),
        ("</s>", 0.0, spm.CONTROL),
        ("a", -5.0, spm.NORMAL),
        ("b", -5.0, spm.NORMAL),
        (spm._SPACE, -5.0, spm.NORMAL),
        ("ab", -1.0, spm.NORMAL),
        ("abb", -0.5, spm.NORMAL),
    ]
    proto = spm.build_model_proto(pieces, model_type=2, add_dummy_prefix=False)
    sp = spm.SentencePieceProcessor(model_proto=proto)
    ids = sp.encode("abb")
    assert [sp.id_to_piece(i) for i in ids] == ["abb"]
    ids = sp.encode("abab")
    assert [sp.id_to_piece(i) for i in ids] == ["ab", "ab"]


def test_spm_unknown_chars():
    sp = spm.build_test_processor()
    ids = sp.encode("héllo")  # é not in test vocab
    assert sp.unk_id() in ids


def test_state_discretization():
    cfg = StateDiscretizationConfig(bins=256, min_dim=4)
    s = cfg.discretize_state(np.array([-1.0, 0.0, 1.0, 0.5]))
    vals = [int(v) for v in s.split()]
    assert vals[0] == 0
    assert vals[1] == 128
    assert vals[2] == 255
    # zero-pad trimming keeps min_dim
    s2 = cfg.discretize_state(np.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0]))
    assert len(s2.split()) == 4


def test_checkers():
    assert is_number("x5y")
    assert not is_number("abc")
    assert is_direction_natural("▁forward")
    assert is_critical_directional("▁left")
    assert not is_direction_natural("banana")  # contains no direction word


def test_prompt_format():
    out = LAP_PROMPT_FORMAT.format_prompt(
        "pick_up the block.", state=np.zeros(10), state_type=None
    )
    assert out.startswith("Task: pick up the block, predict the robot's action in the robot base frame; State: ")
    assert out.endswith("Answer: ")


def test_paligemma_tokenize_masks():
    tok = PaligemmaTokenizer(max_len=160)
    tokens, attn, reasoning, number, direction, loss = tok.tokenize(
        "pick up the block",
        reasoning="move forward 5 cm and rotate left 10 degrees",
        state=np.linspace(-1, 1, 8),
    )
    assert tokens.shape == (160,)
    assert attn.dtype == bool and attn.sum() > 0
    # Reasoning masks mark the reasoning segment only.
    assert reasoning.sum() > 0
    assert not reasoning[: np.argmax(reasoning)].any()
    # Reasoning region contains number and direction tokens.
    assert number.sum() > 0
    assert direction.sum() > 0
    assert (number & ~reasoning).sum() == 0
    # Decoded text contains the reasoning words.
    text = tok.decode(tokens)
    assert "forward" in text and "5" in text


def test_paligemma_reasoning_dropout():
    np.random.seed(0)
    tok = PaligemmaTokenizer(max_len=64, reasoning_mask_prob=1.0)
    _, _, reasoning, _, _, loss = tok.tokenize("a", reasoning="move forward 5 cm")
    # All reasoning tokens dropped from the loss.
    assert not (loss & reasoning).any()


def test_paligemma_no_reasoning():
    tok = PaligemmaTokenizer(max_len=32)
    tokens, attn, reasoning, number, direction, loss = tok.tokenize("do a task")
    assert reasoning is None and number is None and direction is None


def test_truncation():
    tok = PaligemmaTokenizer(max_len=8)
    tokens, attn, *_ = tok.tokenize("pick", reasoning="move forward 5 cm " * 10)
    assert tokens.shape == (8,)
    assert attn.all()


def test_gemma3_prefix_structure():
    tok = Gemma3Tokenizer(max_len=700, num_images=2)
    tokens, attn, reasoning, *_ = tok.tokenize(
        "pick up the block", reasoning="move left 3 cm"
    )
    toks = tokens.tolist()
    assert toks[0] == GEMMA3_BOS_TOKEN
    assert toks.count(GEMMA3_BEGIN_IMAGE_TOKEN) == 2
    assert toks.count(GEMMA3_IMAGE_TOKEN) == 512
    # image placeholders contiguous (256 each)
    first = toks.index(GEMMA3_IMAGE_TOKEN)
    assert all(t == GEMMA3_IMAGE_TOKEN for t in toks[first : first + 256])


# ---------------------------------------------------------------------------
# Byte-parity vs a real sentencepiece model (env-gated: no .model file or
# sentencepiece wheel ships in the offline image). With
# LAP_TPU_TOKENIZER_MODEL set this becomes the released-checkpoint parity
# gate of BASELINE.md.
# ---------------------------------------------------------------------------

import os  # noqa: E402

_REAL_MODEL = os.environ.get("LAP_TPU_TOKENIZER_MODEL")

PARITY_STRINGS = [
    "pick up the red mug and place it on the plate",
    "The robot moves forward 0.25 meters, rotates -15 degrees.",
    "<loc0123><loc0456><loc0789><loc1000> cup",
    "move left and forward\n",
    "…unicode ✓ bytes ÿ",
]


@pytest.mark.skipif(
    not (_REAL_MODEL and os.path.exists(_REAL_MODEL)),
    reason="LAP_TPU_TOKENIZER_MODEL not set (offline image has no .model)",
)
def test_spm_roundtrip_real_model():
    proc = spm.SentencePieceProcessor(_REAL_MODEL)
    for text in PARITY_STRINGS:
        ids = proc.encode(text)
        assert ids, text
        assert proc.decode(ids).strip() == text.strip()


@pytest.mark.skipif(
    not (_REAL_MODEL and os.path.exists(_REAL_MODEL)),
    reason="LAP_TPU_TOKENIZER_MODEL not set",
)
def test_spm_byte_parity_vs_sentencepiece():
    real_spm = pytest.importorskip("sentencepiece")
    ref = real_spm.SentencePieceProcessor(model_file=_REAL_MODEL)
    proc = spm.SentencePieceProcessor(_REAL_MODEL)
    for text in PARITY_STRINGS:
        assert proc.encode(text) == list(ref.encode(text)), text
