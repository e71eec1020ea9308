"""Lucene 4.6 SmallFloat 8-bit norm quantization, vectorized in numpy.

Lucene stores the per-document length norm as ONE byte: at index time
``BM25Similarity.encodeNormValue`` writes ``floatToByte315(boost / sqrt(dl))``
and at search time decodes it through a 256-entry table ``1 / f**2`` giving a
*quantized* document length. xltsearch selects this similarity at
``Config.java:83`` and applies it at ``IndexTask.java:57`` /
``SearchTask.java:58``; reproducing the quantization is required for
rank-identical scores (SURVEY.md Q15).

``floatToByte315`` is SmallFloat's 3-mantissa-bit / 5-exponent-bit /
zeroExp=15 encoding (public Lucene semantics). All functions are numpy
array-in/array-out — no per-row Python.
"""

from __future__ import annotations

import numpy as np


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.floatToByte315: float32 -> uint8."""
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32).astype(np.int64)
    smallfloat = bits >> 21  # >>> (24 - 3); sign bit only set for f<=0, handled below
    lo = (63 - 15) << 3
    out = (smallfloat - lo).astype(np.int64)
    # underflow: anything <= lo encodes as 0 (or 1 for tiny positives)
    tiny = (smallfloat <= lo)
    out = np.where(tiny & (bits > 0), 1, out)
    out = np.where(tiny & (bits <= 0), 0, out)
    # overflow: saturate to 255 (-1 as byte)
    out = np.where(smallfloat >= lo + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte315ToFloat: uint8 -> float32."""
    bu = np.asarray(b, dtype=np.uint8).astype(np.int64)
    bits = (bu << 21) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32).copy()
    out[bu == 0] = 0.0
    return out


# 256-entry decode tables, computed once at import (cheap, deterministic).
_ALL_BYTES = np.arange(256, dtype=np.uint8)
NORM_TABLE = byte315_to_float(_ALL_BYTES)  # decoded 1/sqrt(dl)
with np.errstate(divide="ignore", over="ignore"):
    # BM25Similarity's decoded doc length: 1 / norm^2 (byte 0 -> +inf, never
    # hit for real docs since dl >= 1 encodes to >= 1).
    DECODED_DL_TABLE = np.where(NORM_TABLE > 0, 1.0 / (NORM_TABLE.astype(np.float64) ** 2), np.inf)


def encode_doc_length(dl: np.ndarray) -> np.ndarray:
    """dl (token count, discountOverlaps=true) -> 1-byte norm, as Lucene BM25/Default do."""
    dl64 = np.asarray(dl, dtype=np.float64)
    with np.errstate(divide="ignore"):
        norm = np.where(dl64 > 0, 1.0 / np.sqrt(dl64), 0.0)
    return float_to_byte315(norm.astype(np.float32))


def quantized_doc_length(dl: np.ndarray) -> np.ndarray:
    """Round-trip dl through the 8-bit norm: the dl BM25 actually scores with."""
    return DECODED_DL_TABLE[encode_doc_length(dl)]


def decoded_tf_idf_norm(dl: np.ndarray) -> np.ndarray:
    """DefaultSimilarity's decoded norm factor 1/sqrt(dl) after quantization."""
    return NORM_TABLE[encode_doc_length(dl)].astype(np.float64)
