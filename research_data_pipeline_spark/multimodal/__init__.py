"""Multimodal (image/audio/video) column support.

Media payloads are opaque ``binary`` columns plus typed metadata — the
representation that scales: blobs stay columnar in Parquet, metadata is
prunable/filterable without touching bytes, and all byte-level work runs
in Arrow-batched ``mapInPandas`` (never row-at-a-time Python).

Real codec decode (JPEG/WAV/MP4) is stubbed — the image/audio libraries
are not in this container — behind ``require_codec`` which raises
``NotImplementedError``; the deterministic fake-decode path exercises the
identical Spark plumbing (schema, batching, partitioning) and is
oracle-checked byte-for-byte.
"""

from .synth import media_table
from . import ops

__all__ = ["media_table", "ops"]
