from pixparse_tpu.ops.attention import dot_product_attention
from pixparse_tpu.ops.loss import cross_entropy_loss
