from sequenzo_spark.compression.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
    gorilla_compress_chunks,
    gorilla_decompress_chunks,
)

__all__ = [
    "encode_timestamps",
    "decode_timestamps",
    "encode_values",
    "decode_values",
    "gorilla_compress_chunks",
    "gorilla_decompress_chunks",
]
