from .attention import dot_product_attention
from .norms import group_norm, layer_norm, modulate

__all__ = ["dot_product_attention", "group_norm", "layer_norm", "modulate"]
