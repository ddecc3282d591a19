from mtix_spark.index.codec import encode_varint, decode_varint, delta_encode, delta_decode  # noqa: F401
