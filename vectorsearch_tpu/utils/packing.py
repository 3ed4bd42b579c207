"""Float packing (reference: util/FloatPacker.java:12-40).

The reference serializes embeddings as little-endian float32 bytes for FDB
values; here device arrays carry vectors natively, but the payload/interop
boundary (importing data exported by the reference, external protocols) still
needs the exact wire format.
"""

from __future__ import annotations

import numpy as np


def floats_to_bytes(values) -> bytes:
    """float sequence -> little-endian float32 bytes (FloatPacker.floatsToBytes)."""
    return np.asarray(values, dtype="<f4").tobytes()


def bytes_to_floats(data: bytes) -> np.ndarray:
    """little-endian float32 bytes -> float32 array (FloatPacker.bytesToFloats)."""
    if len(data) % 4 != 0:
        raise ValueError(f"byte length {len(data)} is not a multiple of 4")
    return np.frombuffer(data, dtype="<f4").copy()
