"""Custom neural-net building blocks.

The reference declares ``layers/`` as the home for "custom nn.Modules" but
ships it empty (``src/pixparse/layers/__init__.py``, ``README.md:177``). Here
it re-exports the first-party blocks the models are built from, so they are
reusable outside the Cruller composition.
"""

from pixparse_tpu.models.bart import (
    BartDecoderLayer,
    CachedCrossAttention,
    CachedSelfAttention,
)
from pixparse_tpu.models.swin import (
    PatchMerging,
    SwinBlock,
    WindowAttention,
)
from pixparse_tpu.models.vit import ViTAttention, ViTBlock, ViTMlp
from pixparse_tpu.ops.attention import dot_product_attention, make_attention_bias
from pixparse_tpu.ops.flash_attention import flash_attention
