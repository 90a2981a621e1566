"""pixparse_tpu: TPU-native document-understanding framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capability surface of
huggingface/pixparse (OCR-free end-to-end document understanding: Donut /
Pix2Struct-style encoder-decoder models, task system, input pipeline,
train/eval loops, metrics), designed TPU-first:

- all model math is jitted flax modules compiled by XLA (MXU-friendly static
  shapes, bf16 compute policy),
- parallelism is a ``jax.sharding.Mesh`` with ``data``/``fsdp``/``model``
  axes and XLA collectives over ICI/DCN (no DDP-object wrapping),
- autoregressive generation is one jitted KV-cached decode loop
  (``lax.while_loop``) instead of per-task Python decode loops,
- the hot input-preprocessing path (resize / pad / normalize / patchify) has
  a fused on-device implementation.

Reference capability map: see SURVEY.md (structural analysis of
/root/reference) — citations in docstrings point into that tree.
"""

__version__ = "0.1.0"
