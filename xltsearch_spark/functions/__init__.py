"""Vectorized numeric kernels: Lucene norm quantization, varint posting codec."""
