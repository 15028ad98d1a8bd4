from .tensor import append_dims, extract_into_tensor, pad_to_multiple

__all__ = ["append_dims", "extract_into_tensor", "pad_to_multiple"]
