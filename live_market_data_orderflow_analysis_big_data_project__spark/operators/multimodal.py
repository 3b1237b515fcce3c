"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (never parsed by Catalyst), metadata travels in typed
columns for pruning/partitioning, and decode / feature-extraction runs in
Arrow-batched ``mapInPandas`` so bytes cross the JVM->Python boundary once
per batch, not per row.

This container has no image/audio codecs (no PIL/cv2/torchaudio), so the
decode step is STUBBED: ``extract_features`` computes real byte-level
features (size, md5, first-byte) that a DuckDB oracle can verify, and
``decode_image`` raises ``NotImplementedError`` unless a decoder is
importable — the Spark-side plumbing (schema, batching, partitioning) is
real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = (
    "doc_id long, modality string, n_bytes long, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, payload_md5 string, first_byte int"
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column + typed metadata.

    The fixture has no real media, so the payload is the UTF-8 encoding of
    the text column — deterministic stand-in bytes with the same schema a
    real ingest (image/audio blobs + modality/codec metadata) would carry.
    """
    payload = F.col(text_col).cast("binary")
    return df.select(
        "doc_id",
        F.lit("text").alias("modality"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Real mapInPandas plumbing: binary cells arrive as Python ``bytes``
    inside pandas batches; features are computed per batch and returned
    under an explicit schema.  Swap the body for a real decoder (resize,
    frame-sample, mel-spectrogram, ...) at deployment.
    """
    import hashlib

    import pandas as pd

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (e.g. NULL source text) yield NULL features
            # rather than raising inside the batch loop — one bad row must
            # not fail the corpus job.
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int64"),
                    "payload_md5": payloads.map(
                        lambda b: None
                        if b is None
                        else hashlib.md5(bytes(b)).hexdigest()
                    ),
                    # nullable Int32: empty/NULL payloads yield NULL
                    "first_byte": payloads.map(
                        lambda b: b[0] if b is not None and len(b) else None
                    ).astype("Int32"),
                }
            )

    return df.mapInPandas(feats, FEATURE_SCHEMA)


def decode_image(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Decode + resize image payloads (STUB — no codec in this container).

    At deployment: PIL/libvips decode inside mapInPandas, emitting
    ``array<float>`` pixel tensors.  Raises until a decoder is available so
    callers fail loudly instead of silently skipping the modality.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/cv2) that is not "
            "installed in this environment; extract_features covers the "
            "byte-level path"
        ) from exc
    raise NotImplementedError("real decoder wiring is deployment-specific")


RESIZE_SCHEMA = "doc_id long, modality string, pixels array<int>"

FRAME_SCHEMA = "doc_id long, frame_idx int, offset long, frame_byte int"


def fake_decode_resize(df: DataFrame, out_len: int = 16) -> DataFrame:
    """Deterministic stand-in for decode+resize: evenly sample the payload
    bytes down to a fixed-length ``array<int>`` "pixel" vector.

    Exercises the real resize plumbing — fixed-size tensor output schema,
    Arrow binary batches, one JVM->Python crossing per batch — with a
    deterministic fake in place of the codec (none in this container).
    Swap the body for PIL/libvips ``resize((w, h))`` at deployment.
    """
    import pandas as pd

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for b in pdf["payload"]:
                # NULL payload -> NULL pixels (decode of nothing is NULL,
                # not an empty tensor); keeps one bad row from failing the job
                if b is None:
                    pixels.append(None)
                    continue
                b = bytes(b)
                n = len(b)
                if n == 0:
                    pixels.append([])
                elif out_len == 1:
                    pixels.append([b[0]])
                else:
                    pixels.append(
                        [b[i * (n - 1) // (out_len - 1)] for i in range(out_len)]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(resize, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic stand-in for video frame-sampling: emit ``n_frames``
    rows per payload at evenly spaced byte offsets (inclusive endpoints,
    ``offset_i = i*(n-1) // (k-1)``).

    The row-exploding batch shape is the real thing (one input row ->
    k output rows inside mapInPandas); a real sampler would seek keyframes
    with pyav/ffmpeg and emit decoded tensors instead of single bytes.
    """
    import pandas as pd

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, vals = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payloads sample no frames, like empty ones (and the
                # oracle's WHERE n > 0), instead of raising mid-batch
                if b is None:
                    continue
                b = bytes(b)
                n = len(b)
                if n == 0:
                    continue
                for i in range(n_frames):
                    off = 0 if n_frames == 1 else i * (n - 1) // (n_frames - 1)
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    vals.append(b[off])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "frame_byte": pd.Series(vals, dtype="int32"),
                }
            )

    return df.mapInPandas(frames, FRAME_SCHEMA)
