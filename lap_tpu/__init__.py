"""lap_tpu — a TPU-native vision-language-action (VLA) training and serving
framework.

A from-scratch rebuild of the capability surface of lihzha/lap (a layer over
Physical Intelligence's OpenPI), re-architected for TPU:

- SPMD over ``jax.sharding.Mesh`` (DP x FSDP x TP axes) instead of per-host
  loops; all collectives emitted by XLA GSPMD.
- Pallas flash-attention kernels for train and decode paths instead of
  materialized ``O(T^2)`` attention logits.
- A TPU-native input pipeline (pure-Python/C++ TFRecord + RLDS decoding,
  threaded prefetch straight into device memory) instead of tf.data.
- flax.linen model definitions with a plain params pytree (no NNX bridge),
  which keeps sharding, checkpointing, and freezing simple and explicit.

Subpackages:
    parallel  — device mesh construction + FSDP/TP sharding rules
    ops       — Pallas kernels and the attention dispatch layer
    models    — SigLIP ViT, multi-expert Gemma/Gemma3, the LAP policy model
    data      — RLDS dataset registry, standardization transforms, loader
    policies  — inference-time input/output transforms + serving
    training  — config, optimizer, train state, checkpoints, loops
"""

__version__ = "0.1.0"
