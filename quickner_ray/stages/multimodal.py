"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

Real codecs are wired behind guarded imports — PIL for images, soundfile
for audio, PyAV for video containers — probed ONCE per actor in
``__init__``; when a library is importable the real decode path runs, and
``NotImplementedError`` is reachable only when no codec exists at all
(this container ships none, so CI exercises the deterministic Q* formats
and the real-codec contract tests skip). The Ray-side plumbing is real
and tested end-to-end either way:

- schema: ``media_id:int64, media_type:string, payload:binary`` (+ per-type
  metadata columns), large payloads -> SMALL batch sizes (``batch_size``
  passed by the caller; a 1 MB payload x 256-row batch x 8 actors = 2 GB of
  heap — size batches so payload_bytes * batch_size * concurrency fits);
- ``synth_media_for_documents`` builds a deterministic fake corpus whose
  decoded features are pure functions of the source ``documents`` columns,
  so the DuckDB oracle can verify the whole generate -> binary -> actor
  decode chain against the source table;
- decode / resize-plan / frame-sample stages are actor pools with one-time
  setup in ``__init__`` (library import probe) and vectorized ``__call__``.

Fake format ("QIMG"): ``b"QIMG" + u16 width + u16 height + u8 channels +
payload[width*height*channels]`` (little-endian), payload byte i =
``(i*7 + media_id) % 256``. width = 16 + media_id % 49, height =
16 + n_chars % 33, channels = 3. Videos ("QVID"): header + u16 n_frames,
n_frames = 10 + media_id % 50.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

QIMG_MAGIC = b"QIMG"
QVID_MAGIC = b"QVID"
QAUD_MAGIC = b"QAUD"


# ---- deterministic synthetic media ------------------------------------------

def synth_image_bytes(media_id: int, n_chars: int) -> bytes:
    w = 16 + media_id % 49
    h = 16 + n_chars % 33
    c = 3
    n = w * h * c
    payload = ((np.arange(n, dtype=np.int64) * 7 + media_id) % 256).astype(np.uint8)
    return QIMG_MAGIC + struct.pack("<HHB", w, h, c) + payload.tobytes()


def synth_video_bytes(media_id: int) -> bytes:
    n_frames = 10 + media_id % 50
    return QVID_MAGIC + struct.pack("<H", n_frames)


def synth_audio_bytes(media_id: int) -> bytes:
    """QAUD: magic + u32 sample_rate + u32 n_samples + i16 samples. Sample
    values are closed-form in (media_id, i) so the DuckDB oracle recomputes
    the decoded features arithmetically."""
    rate = 8000
    n = 800 + media_id % 160
    s = ((np.arange(n, dtype=np.int64) * 7 + media_id * 31) % 256) - 128
    return QAUD_MAGIC + struct.pack("<II", rate, n) + s.astype("<i2").tobytes()


def synth_media_for_documents(documents_parquet: str, out_path: str) -> str:
    """documents.parquet -> media parquet (media_id=doc_id, one image + one
    video row per doc). Pure function of the source table."""
    import pyarrow.parquet as pq

    src = pq.read_table(documents_parquet, columns=["doc_id", "n_chars"])
    ids = src.column("doc_id").to_pylist()
    n_chars = src.column("n_chars").to_pylist()
    media_id, media_type, payload = [], [], []
    for d, nc in zip(ids, n_chars):
        media_id.append(d)
        media_type.append("image")
        payload.append(synth_image_bytes(d, nc))
        media_id.append(d)
        media_type.append("video")
        payload.append(synth_video_bytes(d))
        media_id.append(d)
        media_type.append("audio")
        payload.append(synth_audio_bytes(d))
    tab = pa.Table.from_pydict(
        {
            "media_id": pa.array(media_id, type=pa.int64()),
            "media_type": pa.array(media_type, type=pa.string()),
            "payload": pa.array(payload, type=pa.binary()),
        }
    )
    pq.write_table(tab, out_path, row_group_size=2048)
    return out_path


# ---- actor-pool stages ------------------------------------------------------

class ImageDecodeStage:
    """Decode image payloads -> feature columns
    (width, height, channels, n_bytes).

    Real formats (PNG/JPEG/...) require PIL, which this container lacks:
    that path raises ``NotImplementedError`` (explicit stub). The QIMG fake
    format decodes for real — header parse + payload length check — so the
    schema/actor/batch plumbing is exercised honestly.
    """

    def __init__(self):
        try:  # one-time library probe per actor
            import PIL.Image

            self._pil_image = PIL.Image
        except ImportError:
            self._pil_image = None

    def _decode_one(self, b: bytes) -> tuple[int, int, int]:
        if b[:4] == QIMG_MAGIC:
            w, h, c = struct.unpack_from("<HHB", b, 4)
            if len(b) != 9 + w * h * c:
                raise ValueError("corrupt QIMG payload")
            return w, h, c
        if self._pil_image is not None:  # real formats (PNG/JPEG/...)
            import io

            with self._pil_image.open(io.BytesIO(b)) as im:
                w, h = im.size
                return w, h, len(im.getbands())
        raise NotImplementedError(
            "real image decode requires PIL (unavailable in this container); "
            "only the QIMG synthetic format is supported"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        w, h, c, nb = [], [], [], []
        for b in payloads:
            wi, hi, ci = self._decode_one(b)
            w.append(wi)
            h.append(hi)
            c.append(ci)
            nb.append(len(b))
        out = batch.drop_columns(["payload"])  # features replace the blob
        out = out.append_column("width", pa.array(w, type=pa.int64()))
        out = out.append_column("height", pa.array(h, type=pa.int64()))
        out = out.append_column("channels", pa.array(c, type=pa.int64()))
        out = out.append_column("n_bytes", pa.array(nb, type=pa.int64()))
        return out


class ResizePlanStage:
    """Compute target dims (preserve aspect ratio, longest side ->
    ``max_side``); the pixel resample itself is the stubbed step."""

    def __init__(self, max_side: int = 32):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = np.asarray(batch.column("width").to_pylist(), dtype=np.float64)
        h = np.asarray(batch.column("height").to_pylist(), dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        out_w = np.maximum(1, np.floor(w * scale)).astype(np.int64)
        out_h = np.maximum(1, np.floor(h * scale)).astype(np.int64)
        out = batch.append_column("out_width", pa.array(out_w))
        out = out.append_column("out_height", pa.array(out_h))
        return out


class FrameSampleStage:
    """Video payloads -> one row per sampled frame index (every ``step``-th
    frame). Frame EXTRACTION is stubbed; the explode plumbing is real."""

    def __init__(self, step: int = 5):
        self.step = step
        try:  # real containers (MP4/MKV/...) via PyAV when importable
            import av

            self._av = av
        except ImportError:
            self._av = None

    def _n_frames(self, b: bytes) -> int:
        if b[:4] == QVID_MAGIC:
            (n_frames,) = struct.unpack_from("<H", b, 4)
            return n_frames
        if self._av is not None:
            import io

            with self._av.open(io.BytesIO(b)) as container:
                stream = container.streams.video[0]
                if stream.frames:  # container declares the count
                    return int(stream.frames)
                return sum(1 for _ in container.decode(stream))
        raise NotImplementedError(
            "real video containers require PyAV (unavailable in this "
            "container); only the QVID synthetic format is supported"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_frame = [], []
        for mid, b in zip(ids, payloads):
            for f in range(0, self._n_frames(b), self.step):
                out_id.append(mid)
                out_frame.append(f)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int64()),
            }
        )


def decode_images(ds, *, batch_size: int = 256, concurrency=(1, 8)):
    """Image rows -> feature rows. Small batches: payloads are binary."""
    return ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _decode_audio_payload(b: bytes, sf_mod):
    """Shared audio decode: QAUD fast path, else a real codec (soundfile)
    when importable -> (rate, n_samples, int64 sample array)."""
    if b[:4] == QAUD_MAGIC:
        rate, n = struct.unpack("<II", b[4:12])
        s = np.frombuffer(b[12:], dtype="<i2").astype(np.int64)
        if len(s) != n:
            raise ValueError("corrupt QAUD payload")
        return rate, n, s
    if sf_mod is not None:  # real formats (WAV/FLAC/OGG/...)
        import io

        data, rate = sf_mod.read(io.BytesIO(b), dtype="int16", always_2d=True)
        s = data[:, 0].astype(np.int64)  # first channel, reference layout
        return int(rate), len(s), s
    raise NotImplementedError(
        "real audio codecs require soundfile (unavailable in this "
        "container); only the QAUD synthetic format is supported"
    )


def _probe_soundfile():
    try:
        import soundfile

        return soundfile
    except ImportError:
        return None


class AudioFeatureStage:
    """Decode audio payloads -> (duration_ms, peak_amp, sum_amp). Actor-pool
    stage like the image decoder; QAUD decodes natively, real formats go
    through soundfile when importable (one probe per actor)."""

    def __init__(self):
        self.n_decoded = 0
        self._sf = _probe_soundfile()

    def _decode_one(self, b: bytes):
        return _decode_audio_payload(b, self._sf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        dur, peak, total = [], [], []
        for b in payloads.to_pylist():
            rate, n, s = self._decode_one(b)
            self.n_decoded += 1
            dur.append(n * 1000 // rate)
            peak.append(int(np.abs(s).max()) if n else 0)
            total.append(int(s.sum()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("duration_ms", pa.array(dur, type=pa.int64()))
        out = out.append_column("peak_amp", pa.array(peak, type=pa.int64()))
        return out.append_column("sum_amp", pa.array(total, type=pa.int64()))


def audio_features(ds, *, batch_size: int = 256, concurrency=(1, 8)):
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sql_audio_features(table: str = "documents") -> str:
    """Expected QAUD decode output recomputed arithmetically per doc."""
    return (
        f"SELECT doc_id AS media_id,\n"
        f"  CAST((800 + doc_id % 160) // 8 AS BIGINT) AS duration_ms,\n"
        f"  CAST(list_max(list_transform(l, x -> abs(x))) AS BIGINT) AS peak_amp,\n"
        f"  CAST(list_sum(l) AS BIGINT) AS sum_amp\n"
        f"FROM (SELECT doc_id, list_transform(range(0, 800 + doc_id % 160),\n"
        f"  i -> (i * 7 + doc_id * 31) % 256 - 128) AS l FROM {table})"
    )


def sample_frames(ds, *, step: int = 5, batch_size: int = 256, concurrency=(1, 8)):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"step": step},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---- DuckDB oracle SQL (features as pure functions of `documents`) ----------

def sql_image_features(table: str = "documents") -> str:
    """Expected decode output recomputed from the source table."""
    return (
        f"SELECT doc_id AS media_id,\n"
        f"  CAST(16 + doc_id % 49 AS BIGINT) AS width,\n"
        f"  CAST(16 + n_chars % 33 AS BIGINT) AS height,\n"
        f"  CAST(3 AS BIGINT) AS channels,\n"
        f"  CAST(9 + (16 + doc_id % 49) * (16 + n_chars % 33) * 3 AS BIGINT) AS n_bytes\n"
        f"FROM {table}"
    )


def sql_frame_sample(step: int = 5, table: str = "documents") -> str:
    return (
        f"SELECT doc_id AS media_id, CAST(unnest(range(0, 10 + doc_id % 50, {step})) AS BIGINT)"
        f" AS frame_idx FROM {table}"
    )


LOUD_THRESHOLD = 96  # |sample| >= threshold counts as loud


class AudioSegmentStage:
    """VAD-style loud-segment detection over decoded QAUD samples:
    (n_loud, n_segments, longest_run) per media — the shape of silence
    stripping / speech segmentation in an audio-training pipeline. Fully
    vectorized per payload (boolean diff for run starts, boundary diff for
    run lengths); a real codec slots into the same decode guard as
    AudioFeatureStage."""

    def __init__(self, threshold: int = LOUD_THRESHOLD):
        self.threshold = threshold
        self._sf = _probe_soundfile()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        n_loud, n_seg, longest = [], [], []
        for b in payloads.to_pylist():
            _rate, _n, s = _decode_audio_payload(b, self._sf)
            loud = np.abs(s) >= self.threshold
            n_loud.append(int(loud.sum()))
            edges = np.diff(np.r_[0, loud.astype(np.int8), 0])
            starts = np.flatnonzero(edges == 1)
            ends = np.flatnonzero(edges == -1)
            n_seg.append(len(starts))
            longest.append(int((ends - starts).max()) if len(starts) else 0)
        out = batch.drop_columns(["payload"])
        out = out.append_column("n_loud", pa.array(n_loud, type=pa.int64()))
        out = out.append_column("n_segments", pa.array(n_seg, type=pa.int64()))
        return out.append_column("longest_run", pa.array(longest, type=pa.int64()))


def audio_segments(ds, *, threshold: int = LOUD_THRESHOLD, batch_size: int = 256):
    from .taskstate import task_stage

    return ds.map_batches(
        task_stage(AudioSegmentStage, threshold=threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def sql_audio_segments(
    table: str = "documents", threshold: int = LOUD_THRESHOLD
) -> str:
    """Oracle: the closed-form QAUD samples unnested per doc, loudness runs
    via a lag window + running segment ids."""
    return (
        f"WITH s AS (SELECT doc_id, i,\n"
        f"    (i * 7 + doc_id * 31) % 256 - 128 AS v\n"
        f"  FROM (SELECT doc_id, unnest(range(0, 800 + doc_id % 160)) AS i\n"
        f"        FROM {table})),\n"
        f"l AS (SELECT doc_id, i,\n"
        f"    CASE WHEN abs(v) >= {threshold} THEN 1 ELSE 0 END AS loud FROM s),\n"
        f"r AS (SELECT doc_id, i, loud,\n"
        f"    CASE WHEN loud = 1 AND coalesce(lag(loud) OVER\n"
        f"      (PARTITION BY doc_id ORDER BY i), 0) = 0 THEN 1 ELSE 0 END\n"
        f"      AS seg_start FROM l),\n"
        f"seg AS (SELECT doc_id, i, loud,\n"
        f"    sum(seg_start) OVER (PARTITION BY doc_id ORDER BY i) AS seg_id\n"
        f"  FROM r),\n"
        f"runs AS (SELECT doc_id, seg_id, count(*) AS run_len FROM seg\n"
        f"  WHERE loud = 1 GROUP BY doc_id, seg_id)\n"
        f"SELECT d.doc_id AS media_id,\n"
        f"  CAST(coalesce(t.n_loud, 0) AS BIGINT) AS n_loud,\n"
        f"  CAST(coalesce(t.n_segments, 0) AS BIGINT) AS n_segments,\n"
        f"  CAST(coalesce(t.longest_run, 0) AS BIGINT) AS longest_run\n"
        f"FROM {table} d LEFT JOIN (\n"
        f"  SELECT doc_id, sum(run_len) AS n_loud, count(*) AS n_segments,\n"
        f"    max(run_len) AS longest_run FROM runs GROUP BY doc_id) t\n"
        f"  ON d.doc_id = t.doc_id"
    )


EMBED_DIM = 16


class MediaEmbedStage:
    """Embedding extraction from media payloads — the CLIP-at-scale shape:
    an actor-pool stage that decodes each payload once and emits a
    fixed-dim vector. Real models (CLIP/SigLIP) need torch, absent in this
    container, so the honest stand-in embedding is a position-bucketed
    pixel pooling: ``e[j] = sum of pixel bytes at positions i ≡ j (mod
    d)`` — integer-exact, so the end-to-end plumbing (schema, actor
    signature, explode layout) is oracle-checked, and a learned encoder
    slots into ``_embed_one`` unchanged.

    Output is EXPLODED to (media_id, dim, value) rows: list<float> columns
    hash differently across engines, int64 rows do not."""

    def __init__(self, d: int = EMBED_DIM):
        self.d = d
        try:
            import PIL.Image

            self._pil_image = PIL.Image
        except ImportError:
            self._pil_image = None

    def _pool(self, px: "np.ndarray") -> "np.ndarray":
        return np.bincount(
            np.arange(len(px)) % self.d, weights=px, minlength=self.d
        ).astype(np.int64)

    def _embed_one(self, b: bytes) -> "np.ndarray":
        if b[:4] == QIMG_MAGIC:
            w, h, c = struct.unpack_from("<HHB", b, 4)
            if len(b) != 9 + w * h * c:
                raise ValueError("corrupt QIMG payload")
            px = np.frombuffer(b, dtype=np.uint8, offset=9).astype(np.int64)
            return self._pool(px)
        if self._pil_image is not None:  # real formats: decode -> same pool
            import io

            with self._pil_image.open(io.BytesIO(b)) as im:
                px = np.asarray(im, dtype=np.uint8).reshape(-1).astype(np.int64)
            return self._pool(px)
        raise NotImplementedError(
            "real image decode requires PIL (unavailable); only the QIMG "
            "synthetic format is supported (a learned encoder slots in here)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(payloads)
        # Per-payload work is only the decode; the explode layout is pure
        # vectorized repeat/tile/concatenate.
        embs = (
            np.concatenate([self._embed_one(b) for b in payloads])
            if n
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "media_id": ids.take(pa.array(np.repeat(np.arange(n), self.d))),
                "dim": pa.array(np.tile(np.arange(self.d, dtype=np.int64), n)),
                "value": pa.array(embs, type=pa.int64()),
            }
        )


def embed_images(ds, *, d: int = EMBED_DIM, batch_size: int = 256, concurrency=(1, 8)):
    """Actor-pool embedding extraction over image payloads (zero shuffle)."""
    return ds.map_batches(
        MediaEmbedStage,
        fn_constructor_kwargs={"d": d},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sql_media_embeddings(d: int = EMBED_DIM, table: str = "documents") -> str:
    """Oracle: the pooled embedding recomputed arithmetically from the
    closed-form QIMG pixel stream p(i) = (i*7 + doc_id) % 256."""
    return (
        f"WITH px AS (SELECT doc_id,\n"
        f"  unnest(range(0, (16 + doc_id % 49) * (16 + n_chars % 33) * 3)) AS i\n"
        f"  FROM {table})\n"
        f"SELECT doc_id AS media_id, CAST(i % {d} AS BIGINT) AS dim,\n"
        f"  CAST(sum((i * 7 + doc_id) % 256) AS BIGINT) AS value\n"
        f"FROM px GROUP BY doc_id, i % {d}"
    )
