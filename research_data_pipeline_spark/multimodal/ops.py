"""Byte-level media operators: Arrow-batched ``mapInPandas`` over binary
columns.

Design rules for 100 TB:

- One ``mapInPandas`` pass per operator — bytes cross the JVM↔Python
  boundary once, in Arrow batches (``spark.sql.execution.arrow.
  maxRecordsPerBatch`` bounds batch memory; blobs here are small, real
  media would lower it).
- Metadata-only predicates (kind, width, n_frames) are applied BEFORE the
  UDF so Parquet pruning skips undecoded bytes.
- Real codecs are gated by ``require_codec`` → ``NotImplementedError``
  in this container; the deterministic fake path uses the same schemas
  and batch shapes, so swapping in PIL/librosa/pyav changes only the
  innermost function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def require_codec(name: str):
    """Import a real codec library or fail loudly.

    STUB: none of PIL/librosa/av ship in this container; decode paths
    that need them raise NotImplementedError at call time, while all
    Spark-side plumbing stays real and tested via the fake-decode path.
    """
    try:
        return __import__(name)
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            f"real media decode needs '{name}', not available in this "
            "environment; use the deterministic fake-decode operators"
        ) from e


def decode_image_real(payload: bytes) -> np.ndarray:
    """Decode a real image to a uint8 pixel array.

    PNG decodes LIVE via the stdlib codec in :mod:`.png` (zlib inflate +
    scanline unfilter — no external library needed, tested in
    test_media.py against ground-truth pixels). Other formats (JPEG et
    al.) need a real codec library and keep the loud ``require_codec``
    gate."""
    payload = bytes(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        return decode_png(payload)
    import io  # pragma: no cover - needs PIL

    pil = require_codec("PIL.Image")  # pragma: no cover
    return np.asarray(pil.open(io.BytesIO(payload)))  # pragma: no cover


def decode_audio_real(payload: bytes):
    """Decode real audio to (samples, sample_rate).

    WAV/PCM decodes LIVE via the stdlib codec in :mod:`.wav`; compressed
    formats (MP3/AAC/FLAC) need a real codec library and keep the loud
    ``require_codec`` gate."""
    payload = bytes(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from .wav import decode_wav

        return decode_wav(payload)
    require_codec("librosa")  # pragma: no cover
    raise AssertionError("unreachable")  # pragma: no cover


def real_audio_stats(media: DataFrame) -> DataFrame:
    """Decode REAL audio payloads (WAV/PCM) and emit per-clip stats:
    (doc_id, sample_rate, n_frames, n_channels, duration_ms,
    sum_abs_sample, peak_abs_sample) — the loudness/duration audit an
    audio-curation pass computes. Same Arrow-batched single-pass shape as
    the image path; only kind='audio' bytes ship to Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav import decode_wav

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "sample_rate": [], "n_frames": [],
                "n_channels": [], "duration_ms": [], "sum_abs_sample": [],
                "peak_abs_sample": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                frames = samples.shape[0]
                ch = 1 if samples.ndim == 1 else samples.shape[1]
                absd = np.abs(samples.astype(np.int64))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_frames"].append(frames)
                out["n_channels"].append(ch)
                out["duration_ms"].append(frames * 1000 // rate)
                out["sum_abs_sample"].append(int(absd.sum()))
                out["peak_abs_sample"].append(int(absd.max()) if frames else 0)
            yield pd.DataFrame(out)

    return media.where("kind = 'audio' AND payload IS NOT NULL").select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id bigint, sample_rate bigint, n_frames bigint, "
        "n_channels bigint, duration_ms bigint, sum_abs_sample bigint, "
        "peak_abs_sample bigint",
    )


def real_decode_stats(media: DataFrame) -> DataFrame:
    """Decode REAL image payloads (PNG) and emit per-image pixel stats:
    (doc_id, width, height, channels, n_pixels, pixel_sum, max_pixel).

    Same Arrow-batched single-pass shape as :func:`decode_stats`, but the
    innermost call is :func:`decode_image_real` — the live-codec branch.
    Metadata predicates (kind='image') stay OUTSIDE the UDF so only image
    bytes ship to Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "channels": [],
                "n_pixels": [], "pixel_sum": [], "max_pixel": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_image_real(payload)
                h, w = arr.shape[:2]
                ch = 1 if arr.ndim == 2 else arr.shape[2]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["n_pixels"].append(h * w)
                out["pixel_sum"].append(int(arr.sum(dtype=np.int64)))
                out["max_pixel"].append(int(arr.max()))
            yield pd.DataFrame(out)

    return media.where("kind = 'image' AND payload IS NOT NULL").select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id bigint, width bigint, height bigint, channels bigint, "
        "n_pixels bigint, pixel_sum bigint, max_pixel bigint",
    )


def _bytes(payload) -> np.ndarray:
    return np.frombuffer(bytes(payload), dtype=np.uint8)


def decode_stats(media: DataFrame) -> DataFrame:
    """Fake-decode every blob: byte count, mean/max byte, full byte sum.

    The per-blob loop runs vectorized-enough for metadata-sized blobs;
    for megapixel media the same structure applies with numpy doing the
    heavy lifting per element.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": np.array([len(a) for a in arrs], dtype=np.int64),
                    # sum of exact small ints then one IEEE division — matches
                    # the oracle's AVG over the 16 distinct bytes exactly
                    # (same rational, correctly rounded once)
                    "mean_byte": np.array(
                        [float(int(a.sum(dtype=np.int64))) / len(a) for a in arrs]
                    ),
                    "max_byte": np.array([int(a.max()) for a in arrs], dtype=np.int64),
                    "byte_sum": np.array(
                        [int(a.sum(dtype=np.int64)) for a in arrs], dtype=np.int64
                    ),
                }
            )

    return media.where("payload IS NOT NULL").select(
        "doc_id", "kind", "payload"
    ).mapInPandas(
        run, schema="doc_id bigint, kind string, n_bytes bigint, mean_byte double, "
        "max_byte bigint, byte_sum bigint"
    )


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video blobs: split payload into ``n_frames``
    equal frames, keep every ``every``-th; emits (frame_idx, offset,
    frame_len, first_byte) per kept frame.

    The metadata filter (kind='video') happens before the UDF — image and
    audio bytes are never shipped to Python.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "offset": [],
                "frame_len": [], "first_byte": [],
            }
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                arr = _bytes(payload)
                flen = len(arr) // int(n_frames)
                for idx in range(0, int(n_frames), every):
                    off = idx * flen
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["offset"].append(off)
                    out["frame_len"].append(flen)
                    out["first_byte"].append(int(arr[off]))
            yield pd.DataFrame(out)

    return (
        media.where("kind = 'video' AND payload IS NOT NULL")
        .select("doc_id", "payload", "n_frames")
        .mapInPandas(
            run,
            schema="doc_id bigint, frame_idx bigint, offset bigint, "
            "frame_len bigint, first_byte bigint",
        )
    )


def byte_histogram_features(media: DataFrame, bins: int = 4) -> DataFrame:
    """Feature extraction: normalized byte histogram per blob (the
    stand-in for an embedding model), one fraction column per bin."""
    width = 256 // bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {"doc_id": list(pdf["doc_id"])}
            hists = []
            for payload in pdf["payload"]:
                arr = _bytes(payload)
                counts = np.bincount(arr // width, minlength=bins)[:bins]
                hists.append(counts.astype(np.float64) / len(arr))
            h = np.array(hists)
            for b in range(bins):
                cols[f"h{b}"] = h[:, b]
            yield pd.DataFrame(cols)

    schema = "doc_id bigint, " + ", ".join(f"h{b} double" for b in range(bins))
    # drop-NULL-payload contract: a missing blob has no histogram and
    # the byte kernel would die on the inhomogeneous Arrow batch
    return (
        media.where(F.col("payload").isNotNull())
        .select("doc_id", "payload")
        .mapInPandas(run, schema=schema)
    )


def resize_thumbnail(media: DataFrame, out_len: int = 8) -> DataFrame:
    """Block-mean downsample of the byte array to ``out_len`` bytes — the
    deterministic fake of an image resize; returns a new (smaller) binary
    payload plus its hex preview. Real codecs slot into the same shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs, hexes = [], []
            for payload in pdf["payload"]:
                arr = _bytes(payload)
                block = max(1, len(arr) // out_len)
                t = np.array(
                    [int(arr[i : i + block].mean()) for i in range(0, len(arr), block)][
                        :out_len
                    ],
                    dtype=np.uint8,
                )
                thumbs.append(t.tobytes())
                hexes.append(t.tobytes().hex())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "thumb": thumbs, "thumb_hex": hexes}
            )

    return media.where("kind = 'image' AND payload IS NOT NULL").select("doc_id", "payload").mapInPandas(
        run, schema="doc_id bigint, thumb binary, thumb_hex string"
    )


def frame_hash_stats(media: DataFrame) -> DataFrame:
    """Frame-level dedup signal for video blobs: split the payload into
    its ``n_frames`` equal frames, hash each frame's bytes, and report
    per video how much of it is repeated frames — the sampling signal a
    video-curation pipeline uses to drop near-static clips. Emits
    (doc_id, n_frames, n_distinct_frames, dup_frame_ratio).

    One Arrow-batched pass (metadata filter prunes to video BEFORE the
    UDF); the per-frame md5 happens inside the batch, so only the small
    per-doc aggregate leaves Python.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "n_frames": [], "n_distinct_frames": [],
            }
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                arr = _bytes(payload)
                n = int(n_frames)
                flen = len(arr) // n
                hashes = {
                    hashlib.md5(bytes(arr[i * flen : (i + 1) * flen])).hexdigest()
                    for i in range(n)
                }
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n)
                out["n_distinct_frames"].append(len(hashes))
            yield pd.DataFrame(out)

    stats = (
        media.where("kind = 'video' AND payload IS NOT NULL")
        .select("doc_id", "payload", "n_frames")
        .mapInPandas(
            run,
            schema="doc_id bigint, n_frames bigint, n_distinct_frames bigint",
        )
    )
    return stats.select(
        "doc_id",
        "n_frames",
        "n_distinct_frames",
        (
            F.lit(1.0)
            - F.col("n_distinct_frames").cast("double") / F.col("n_frames")
        ).alias("dup_frame_ratio"),
    )


def png_roundtrip_stats(media: DataFrame) -> DataFrame:
    """Drive the REAL PNG codec distributed: each image payload is
    interpreted as a 4-row grayscale bitmap, encoded to a real PNG
    (scanline filter rotated per doc so all five unfilter paths run on
    fleet data), decoded back, and verified pixel-for-pixel against the
    source. Emits (doc_id, width, height, pixel_sum, max_pixel,
    roundtrip_ok) — the stats are decode-side, so a broken codec can't
    hide: any pixel corruption flips roundtrip_ok and shifts pixel_sum.
    The oracle computes the same stats straight from the source bytes
    (encode→decode is lossless), which is what makes a real-codec
    operator oracle-checkable without teaching SQL to inflate zlib."""
    from .png import decode_png, encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "pixel_sum": [],
                "max_pixel": [], "roundtrip_ok": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _bytes(payload).reshape(4, -1)
                dec = decode_png(encode_png(arr, filter_type=int(doc_id) % 5))
                out["doc_id"].append(doc_id)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["pixel_sum"].append(int(dec.sum(dtype=np.int64)))
                out["max_pixel"].append(int(dec.max()))
                out["roundtrip_ok"].append(bool((dec == arr).all()))
            yield pd.DataFrame(out)

    return media.where("kind = 'image' AND payload IS NOT NULL").select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id bigint, width bigint, height bigint, "
        "pixel_sum bigint, max_pixel bigint, roundtrip_ok boolean",
    )


def wav_roundtrip_stats(media: DataFrame) -> DataFrame:
    """Drive the REAL WAV codec distributed: each audio payload is
    interpreted as little-endian int16 PCM samples, encoded to an actual
    WAV at the row's sample_rate, decoded back, and verified
    sample-for-sample. Emits (doc_id, sample_rate, n_samples, sum_abs,
    peak_abs, roundtrip_ok); stats are decode-side so a codec bug can't
    hide. The audio twin of :func:`png_roundtrip_stats`."""
    from .wav import decode_wav, encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "sum_abs": [], "peak_abs": [], "roundtrip_ok": [],
            }
            for doc_id, payload, rate in zip(
                pdf["doc_id"], pdf["payload"], pdf["sample_rate"]
            ):
                arr = np.frombuffer(bytes(payload), dtype="<i2")
                dec, out_rate = decode_wav(encode_wav(arr, int(rate)))
                absd = np.abs(dec.astype(np.int64))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(out_rate)
                out["n_samples"].append(len(dec))
                out["sum_abs"].append(int(absd.sum()))
                out["peak_abs"].append(int(absd.max()))
                out["roundtrip_ok"].append(
                    out_rate == int(rate) and bool((dec == arr).all())
                )
            yield pd.DataFrame(out)

    return media.where("kind = 'audio' AND payload IS NOT NULL").select(
        "doc_id", "payload", "sample_rate"
    ).mapInPandas(
        run,
        schema="doc_id bigint, sample_rate bigint, n_samples bigint, "
        "sum_abs bigint, peak_abs bigint, roundtrip_ok boolean",
    )


def thumbnail_stats(media: DataFrame) -> DataFrame:
    """RESIZE on real pixels: decode each image payload through the REAL
    PNG codec (encode→decode, filter rotated per doc like
    :func:`png_roundtrip_stats`), then 2×2 box-downsample with exact
    integer means (sum of the four source pixels ``div`` 4) — the
    thumbnail step of an image-curation pipeline, with no float
    resampling kernel so the result is bit-reproducible on any engine.
    Emits (doc_id, thumb_w, thumb_h, thumb_sum, thumb_max); stats are
    computed on the POOLED pixels after the codec trip, so both a codec
    bug and a pooling bug shift thumb_sum."""
    from .png import decode_png, encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "thumb_w": [], "thumb_h": [],
                "thumb_sum": [], "thumb_max": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _bytes(payload).reshape(4, -1)
                dec = decode_png(encode_png(arr, filter_type=int(doc_id) % 5))
                p = dec.astype(np.int64)
                t = (
                    p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
                ) // 4
                out["doc_id"].append(doc_id)
                out["thumb_w"].append(t.shape[1])
                out["thumb_h"].append(t.shape[0])
                out["thumb_sum"].append(int(t.sum(dtype=np.int64)))
                out["thumb_max"].append(int(t.max()))
            yield pd.DataFrame(out)

    return media.where("kind = 'image' AND payload IS NOT NULL").select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id bigint, thumb_w bigint, thumb_h bigint, "
        "thumb_sum bigint, thumb_max bigint",
    )


def audio_downsample_stats(media: DataFrame) -> DataFrame:
    """RESAMPLE on real samples: decode each audio payload through the
    REAL WAV codec (encode→decode at the row's sample_rate, like
    :func:`wav_roundtrip_stats`), then decimate 2:1 by pair-averaging
    with FLOOR division ((s₂ᵢ+s₂ᵢ₊₁) floor-div 2 — floor, not truncate:
    engines disagree on negative integer division, floor is the one
    both can express exactly). Emits (doc_id, out_rate, n_out_samples,
    out_sum, out_peak_abs); stats are post-codec AND post-decimation so
    either stage's bug shifts out_sum."""
    from .wav import decode_wav, encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "out_rate": [], "n_out_samples": [],
                "out_sum": [], "out_peak_abs": [],
            }
            for doc_id, payload, rate in zip(
                pdf["doc_id"], pdf["payload"], pdf["sample_rate"]
            ):
                arr = np.frombuffer(bytes(payload), dtype="<i2")
                dec, in_rate = decode_wav(encode_wav(arr, int(rate)))
                s = dec.astype(np.int64)
                n2 = (len(s) // 2) * 2
                ds = np.floor_divide(s[0:n2:2] + s[1:n2:2], 2)
                out["doc_id"].append(doc_id)
                out["out_rate"].append(in_rate // 2)
                out["n_out_samples"].append(len(ds))
                out["out_sum"].append(int(ds.sum(dtype=np.int64)))
                out["out_peak_abs"].append(
                    int(np.abs(ds).max()) if len(ds) else 0
                )
            yield pd.DataFrame(out)

    return media.where("kind = 'audio' AND payload IS NOT NULL").select(
        "doc_id", "payload", "sample_rate"
    ).mapInPandas(
        run,
        schema="doc_id bigint, out_rate bigint, n_out_samples bigint, "
        "out_sum bigint, out_peak_abs bigint",
    )


def audio_quality_stats(
    media: DataFrame,
    clip_abs: int = 30000,
    silent_abs: int = 1000,
) -> DataFrame:
    """Audio QUALITY GATE on real samples — the media twin of the text
    quality rules (d51): decode each payload through the REAL WAV codec
    (encode→decode at the row's sample_rate), then compute the gate
    statistics a speech-data pipeline cuts with: exact sum of squares
    (for RMS), peak amplitude, near-clipped sample count (|s| >=
    ``clip_abs``) and near-silent sample count (|s| <= ``silent_abs``).
    Verdict: kept iff NO clipped and NO silent samples. All counters are
    exact int64 sums computed on the DECODED samples, so a codec bug
    shifts them. Emits (doc_id, n_samples, sumsq, peak_abs, clipped_n,
    silent_n, verdict)."""
    from .wav import decode_wav, encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "n_samples": [], "sumsq": [], "peak_abs": [],
                "clipped_n": [], "silent_n": [], "verdict": [],
            }
            for doc_id, payload, rate in zip(
                pdf["doc_id"], pdf["payload"], pdf["sample_rate"]
            ):
                arr = np.frombuffer(bytes(payload), dtype="<i2")
                dec, _ = decode_wav(encode_wav(arr, int(rate)))
                s = dec.astype(np.int64)
                a = np.abs(s)
                clipped = int((a >= clip_abs).sum())
                silent = int((a <= silent_abs).sum())
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(s))
                out["sumsq"].append(int((s * s).sum()))
                out["peak_abs"].append(int(a.max()) if len(s) else 0)
                out["clipped_n"].append(clipped)
                out["silent_n"].append(silent)
                out["verdict"].append(
                    "kept" if clipped == 0 and silent == 0 else "dropped"
                )
            yield pd.DataFrame(out)

    return media.where("kind = 'audio' AND payload IS NOT NULL").select(
        "doc_id", "payload", "sample_rate"
    ).mapInPandas(
        run,
        schema="doc_id bigint, n_samples bigint, sumsq bigint, "
        "peak_abs bigint, clipped_n bigint, silent_n bigint, "
        "verdict string",
    )


def perceptual_hash(media: DataFrame) -> DataFrame:
    """64-bit neighborhood-pair average-hash of every image computed
    from REAL decoded pixels: the payload is encoded to an actual PNG
    (filter rotated per doc, as in :func:`png_roundtrip_stats`), decoded
    back through the real codec, and the hash derives from decode-side
    pixels only. Bit (j, a) — j ∈ [0,4) the band, a ∈ [0,16) the bit —
    is set when pixels a and (a+j+1) mod 16 of the decoded byte cycle
    sum above twice the image's integer mean (pixel_sum div n_pixels):
    the dHash/aHash family (a lag-j neighborhood mean vs the global
    mean), with the four lags giving 64 DISTINCT pair functions so the
    hash carries genuine 64-bit spread even when the payload's byte
    cycle is short (the round-8 16-bit aHash funneled the band join
    through 2⁴ values per band and measured 15.5× wall at 30× rows —
    fixed-bit sketch physics; 16-bit bands collide ~2¹²× less). A codec
    bug that corrupts any pixel shifts the mean or flips pair sums, so
    the hash remains a decode-integrity signal as well as a dedup key.
    Emits (doc_id, b0, b1, b2, b3), the four 16-bit bands of the 64-bit
    hash (band j holds bits [16j, 16j+16)) — kept as separate columns
    so the band join never reassembles (and never overflows) the full
    word."""
    from .png import decode_png, encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[int]] = {
                "doc_id": [], "b0": [], "b1": [], "b2": [], "b3": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _bytes(payload).reshape(4, -1)
                dec = decode_png(encode_png(arr, filter_type=int(doc_id) % 5))
                flat = dec.flatten()
                mean = int(flat.sum(dtype=np.int64)) // flat.size
                m = flat[:16].astype(np.int64)
                out["doc_id"].append(int(doc_id))
                for j in range(4):
                    pair = m + np.roll(m, -(j + 1))
                    bits = (pair > 2 * mean).astype(np.int64)
                    out[f"b{j}"].append(int((bits << np.arange(16)).sum()))
            yield pd.DataFrame(out)

    return media.where("kind = 'image' AND payload IS NOT NULL").select(
        "doc_id", "payload"
    ).mapInPandas(
        run,
        schema="doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint",
    )


def frame_sums(media: DataFrame) -> DataFrame:
    """Per-frame byte sums of every video payload — the signature the
    scene-cut detector differences. One Arrow pass; the payload splits
    into n_frames equal frames and each frame reduces to one integer
    inside numpy (reshape + row sum), so the output is frames-sized,
    never bytes-sized. Emits (doc_id, frame_idx, frame_len, frame_sum)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            sums: list[int] = []
            for doc_id, payload, nf in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                arr = _bytes(payload)
                nf = int(nf)
                L = len(arr) // nf
                fs = arr[: L * nf].reshape(nf, L).sum(axis=1, dtype=np.int64)
                ids.extend([int(doc_id)] * nf)
                idxs.extend(range(nf))
                lens.extend([L] * nf)
                sums.extend(int(x) for x in fs)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens,
                 "frame_sum": sums}
            )

    return media.where(
        "kind = 'video' AND payload IS NOT NULL AND n_frames > 0"
    ).select("doc_id", "payload", "n_frames").mapInPandas(
        run,
        schema="doc_id bigint, frame_idx bigint, frame_len bigint, "
        "frame_sum bigint",
    )


def extract_frames(media: DataFrame, frames: DataFrame) -> DataFrame:
    """Targeted frame EXTRACTION: pull the requested (doc_id, frame_idx)
    frames out of the video payloads in one Arrow pass — the second half
    of the keyframe pipeline (a detector chooses the indices JVM-side;
    this op touches bytes only for the chosen frames' videos).

    ``frames`` is the index table; it collapses to one bounded
    per-video index list (≤ n_frames entries) before joining the
    payload, so the Arrow batch carries each video's bytes exactly once
    no matter how many frames are requested. Emits (doc_id, frame_idx,
    offset, frame_len, first_byte) per requested frame."""
    klist = frames.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("frame_idx")).alias("idxs")
    )
    src = media.where(
        "kind = 'video' AND payload IS NOT NULL AND n_frames > 0"
    ).select("doc_id", "payload", "n_frames").join(klist, "doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "offset": [],
                "frame_len": [], "first_byte": [],
            }
            for doc_id, payload, nf, idxs in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"], pdf["idxs"]
            ):
                arr = _bytes(payload)
                L = len(arr) // int(nf)
                for idx in idxs:
                    off = int(idx) * L
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(int(idx))
                    out["offset"].append(off)
                    out["frame_len"].append(L)
                    out["first_byte"].append(int(arr[off]))
            yield pd.DataFrame(out)

    return src.mapInPandas(
        run,
        schema="doc_id bigint, frame_idx bigint, offset bigint, "
        "frame_len bigint, first_byte bigint",
    )


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """64-bit neighborhood-pair fingerprint of every audio clip computed
    from the REAL decoded PCM BYTE stream: the payload round-trips the
    real WAV codec (encode at the row's sample_rate → decode), the
    decoded samples are viewed as their little-endian byte stream, and
    the hash is the m13 geometry over the 16-byte cycle — bit (j, a)
    set when bytes a and (a+j+1) mod 16 sum above twice the stream's
    integer mean, 64 pairwise-distinct pair functions in 16 dimensions.
    The byte view is deliberate: 8 int16 samples span only an 8-dim
    threshold-cell space (~2³² cells at best — two redesigns measured
    482 then 204 chance hamming≤3 pairs at sf0.1), while the 16-byte
    view gives the same ~2⁵³-cell spread m13 has, so surviving pairs
    are true payload duplicates. A codec bug that corrupts any sample
    corrupts its bytes and flips pair sums. Emits
    (doc_id, b0, b1, b2, b3) — four 16-bit bands, kept as separate
    columns for the pigeonhole band join."""
    from .wav import decode_wav, encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[int]] = {
                "doc_id": [], "b0": [], "b1": [], "b2": [], "b3": [],
            }
            for doc_id, payload, rate in zip(
                pdf["doc_id"], pdf["payload"], pdf["sample_rate"]
            ):
                arr = np.frombuffer(bytes(payload), dtype="<i2")
                dec, _ = decode_wav(encode_wav(arr, int(rate)))
                by = np.frombuffer(
                    dec.astype("<i2").tobytes(), dtype=np.uint8
                )
                mean = int(by.sum(dtype=np.int64)) // by.size
                m = by[:16].astype(np.int64)
                out["doc_id"].append(int(doc_id))
                for j in range(4):
                    pair = m + np.roll(m, -(j + 1))
                    bits = (pair > 2 * mean).astype(np.int64)
                    out[f"b{j}"].append(int((bits << np.arange(16)).sum()))
            yield pd.DataFrame(out)

    return media.where("kind = 'audio' AND payload IS NOT NULL").select(
        "doc_id", "payload", "sample_rate"
    ).mapInPandas(
        run,
        schema="doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint",
    )
