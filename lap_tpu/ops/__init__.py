from lap_tpu.ops.attention import attention, xla_attention
from lap_tpu.ops.flash_attention import flash_attention
from lap_tpu.ops.masks import (
    bidirectional_block_mask,
    combine_masks,
    make_attn_mask,
    sliding_window_mask,
)
from lap_tpu.ops.rope import apply_rope

__all__ = [
    "apply_rope",
    "attention",
    "bidirectional_block_mask",
    "combine_masks",
    "flash_attention",
    "make_attn_mask",
    "sliding_window_mask",
    "xla_attention",
]
