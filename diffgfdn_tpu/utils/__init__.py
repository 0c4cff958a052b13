from .cio import (
    decode_batch,
    encode_batch,
    encode_complex,
    init_with_batch,
    to_real_pair,
)

__all__ = [
    "decode_batch",
    "encode_batch",
    "encode_complex",
    "init_with_batch",
    "to_real_pair",
]
