from panst3r_tpu.ops.rope import Rope2D, apply_rope_2d
from panst3r_tpu.ops.attention import dot_product_attention
