"""Multimodal (image/audio/video) column support.

Media payloads are opaque ``binary`` columns plus typed metadata — the
representation that scales: blobs stay columnar in Parquet, metadata is
prunable/filterable without touching bytes, and all byte-level work runs
in Arrow-batched ``mapInPandas`` (never row-at-a-time Python).

PNG and WAV decode/encode are REAL — pure-stdlib codecs in ``png.py``
(zlib inflate + all five filter types) and ``wav.py`` (RIFF/PCM), both
distributed via ``mapInPandas`` and oracle-checked pixel/sample-exact
(m08-m12). Only formats the stdlib cannot decode (JPEG/MP3/MP4) stay
behind the loud ``require_codec`` gate, which raises
``NotImplementedError``; the deterministic fake-decode path exercises the
identical Spark plumbing (schema, batching, partitioning) for those.
"""

from .synth import media_table
from . import ops

__all__ = ["media_table", "ops"]
