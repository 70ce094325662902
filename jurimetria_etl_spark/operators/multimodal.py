"""Multimodal columns (SURVEY §2.12 E5): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side plumbing — schemas, binary-file scan, batch iteration, UDF
signatures, partition sizing — is real and tested.  The actual media
decoding is STUBBED (``decode_fn``): the image/audio libraries are not in
this container; production swaps in PIL/ffmpeg et al. without touching the
plan shape.  A deterministic fake decoder is provided for tests.

Scale notes:
- ``binaryFile`` scans parallelize by file; ``maxPartitionBytes`` keeps a
  partition's blobs within executor memory.
- ``mapInPandas`` streams Arrow batches — blobs never materialize on the
  driver and per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modification_time", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Scan media files as (path, mtime, length, content) rows — the
    built-in binaryFile source, file-parallel."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def fake_image_decoder(content: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real decoder: derives pseudo-metadata
    from the bytes themselves (stable across runs/executors), so tests can
    assert the full pipeline without PIL."""
    n = len(content or b"")
    return {
        "media_type": "image",
        "format": "fake",
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "duration_ms": None,
        "n_channels": 3,
    }


def unavailable_decoder(content: bytes) -> dict[str, Any]:
    """The production slot: replace with PIL/soundfile/pyav."""
    raise NotImplementedError(
        "media decoding libraries are not available in this environment; "
        "inject a real decoder (PIL/ffmpeg) or use fake_image_decoder for tests"
    )


def extract_media_metadata(
    df: DataFrame,
    content_col: str = "content",
    decode_fn: Callable[[bytes], dict[str, Any]] = unavailable_decoder,
    batch_cols: tuple[str, ...] = ("path", "length"),
) -> DataFrame:
    """Decode/inspect each blob via Arrow-batched mapInPandas → typed metadata
    struct alongside the passthrough columns."""
    import pandas as pd

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in batch_cols]
        + [T.StructField("meta", MEDIA_META_SCHEMA)]
    )
    meta_fields = [f.name for f in MEDIA_META_SCHEMA.fields]
    # Prune BEFORE the Python boundary: Arrow serializes every input
    # column of mapInPandas, so an unneeded text/path column would ship to
    # Python and back for nothing.
    df = df.select(*[c for c in df.columns if c in batch_cols or c == content_col])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_fn(c) for c in pdf[content_col]]
            out = pdf[[c for c in batch_cols if c in pdf.columns]].copy()
            out["meta"] = [
                {k: m.get(k) for k in meta_fields} for m in metas
            ]
            yield out

    return df.mapInPandas(process, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    content_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """Frame-sampling plumbing: emit up to ``max_frames`` byte-slices per
    blob (the video-frame-sample shape: one input row → N frame rows).
    Real frame extraction replaces the slicing; the explode/flatMap plan
    shape is the part that matters at scale."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    df = df.select(id_col, content_col)  # prune the Arrow boundary

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, idxs, frames = [], [], []
            for src, content in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(content or b"")
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    srcs.append(src)
                    idxs.append(i)
                    frames.append(blob[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"src": srcs, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(process, schema=out_schema)


def fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: emits exactly
    ``width*height`` bytes derived from the input by cyclic repetition
    (stable, size-exact — the property a resize has).  Production swaps in
    PIL ``Image.resize`` without touching the plan."""
    blob = bytes(content or b"\x00")
    n = width * height
    reps = (n // len(blob)) + 1
    return (blob * reps)[:n]


def transform_media(
    df: DataFrame,
    transform_fn: Callable[[bytes], bytes] | None = None,
    content_col: str = "content",
    id_col: str = "path",
    out_col: str = "content",
) -> DataFrame:
    """Blob→blob transform plumbing (the resize/transcode shape): Arrow
    batches in, same-cardinality batches out, blobs never on the driver.
    ``transform_fn`` is the per-blob operation — a real resize in
    production, ``fake_resize`` in tests."""
    import pandas as pd

    if transform_fn is None:
        def transform_fn(b: bytes) -> bytes:  # pragma: no cover - prod slot
            raise NotImplementedError(
                "media libraries unavailable; inject a transform_fn"
            )

    out_schema = T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField(out_col, T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    df = df.select(id_col, content_col)  # prune the Arrow boundary

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [transform_fn(bytes(c or b"")) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "src": list(pdf[id_col]),
                    out_col: blobs,
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    return df.mapInPandas(process, schema=out_schema)


def fake_featurizer(content: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for an embedding model: L1-normalized byte
    histogram folded into ``dim`` buckets.  Real feature extraction (CLIP,
    wav2vec, …) replaces this; the output contract — fixed-dim
    array<float> per blob — is what the similarity operators consume."""
    blob = bytes(content or b"\x00")
    counts = [0] * dim
    for b in blob:
        counts[b % dim] += 1
    total = float(len(blob))
    return [c / total for c in counts]


def extract_features(
    df: DataFrame,
    featurize_fn: Callable[[bytes], list[float]] | None = None,
    dim: int = 16,
    content_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """Blob→embedding plumbing (the feature-extract shape): each blob maps
    to a fixed-dim ``array<float>`` ready for the E3 similarity operators
    (``cosine_topk``, LSH/IVF ANN, ``cosine_similarity_join``) — the
    multimodal near-dup path is feature-extract → embedding-cosine."""
    import pandas as pd

    fn = featurize_fn or (lambda b: fake_featurizer(b, dim))
    out_schema = T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = df.select(id_col, content_col)  # prune the Arrow boundary

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "src": list(pdf[id_col]),
                    "embedding": [fn(bytes(c or b"")) for c in pdf[content_col]],
                }
            )

    return df.mapInPandas(process, schema=out_schema)


def attach_text_as_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: synthesize a binary column from text (the container has
    no media files); keeps the downstream plumbing identical."""
    return df.withColumn("content", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "path", F.concat(F.lit("mem://doc/"), F.col("doc_id").cast("string"))
    ).withColumn("length", F.length(F.col("content")).cast("long"))
