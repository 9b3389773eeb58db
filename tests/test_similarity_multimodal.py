"""IVF similarity index + multimodal plumbing stages."""

from __future__ import annotations

import os
import struct

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickner_ray.stages import multimodal as mm
from quickner_ray.stages import similarity as sim


def _write_embeddings(path: str, n: int = 300, dim: int = 16, n_clusters: int = 5):
    """Clustered synthetic embeddings: cluster structure IVF can exploit."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(n_clusters, dim)) * 4
    mat = centers[np.arange(n) % n_clusters] + rng.normal(size=(n, dim))
    tab = pa.Table.from_pydict(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tab, path)
    return mat


class TestIVF:
    def test_train_centroids_deterministic(self):
        rng = np.random.default_rng(0)
        mat = sim._unit(rng.normal(size=(100, 8)))
        c1 = sim.train_centroids(mat, 4)
        c2 = sim.train_centroids(mat, 4)
        assert np.array_equal(c1, c2)
        assert c1.shape == (4, 8)
        # centroids are unit vectors
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    def test_index_layout_and_recall(self, ray_session, tmp_path):
        emb = str(tmp_path / "emb.parquet")
        mat = _write_embeddings(emb)
        index_dir = str(tmp_path / "ivf")
        cent = sim.build_ivf_index(emb, index_dir, n_clusters=8)
        assert os.path.exists(os.path.join(index_dir, "centroids.npy"))
        parts = [d for d in os.listdir(index_dir) if d.startswith("cluster_id=")]
        assert 1 < len(parts) <= 8
        # every vector lands in exactly one partition
        total = sum(
            pq.read_table(os.path.join(index_dir, d)).num_rows for d in parts
        )
        assert total == 300

        # recall vs brute force for a handful of queries
        unit = sim._unit(mat.astype(np.float64))
        for qid in (0, 7, 42):
            q = mat[qid].astype(np.float64)
            got = sim.query_ivf_index(index_dir, q, k=10, nprobe=4).to_pandas()
            cos = unit @ (q / np.linalg.norm(q))
            exact = set(np.argsort(-cos)[:10])
            recall = len(exact & set(got["vec_id"])) / 10
            assert recall >= 0.9, (qid, recall)
            # top-1 is the query vector itself
            assert got.iloc[0]["vec_id"] == qid

    def test_distributed_trainer_recall_and_determinism(self, ray_session, tmp_path):
        """train_on='full' (streaming partial-sum spherical k-means) builds
        an index with the same recall bar as the sample trainer, and its
        centroids are identical across block layouts (parallelism)."""
        import ray.data as rd

        emb = str(tmp_path / "emb.parquet")
        mat = _write_embeddings(emb)
        index_dir = str(tmp_path / "ivf_full")
        sim.build_ivf_index(emb, index_dir, n_clusters=8, train_on="full")
        unit = sim._unit(mat.astype(np.float64))
        for qid in (0, 7, 42):
            q = mat[qid].astype(np.float64)
            got = sim.query_ivf_index(index_dir, q, k=10, nprobe=4).to_pandas()
            cos = unit @ (q / np.linalg.norm(q))
            exact = set(np.argsort(-cos)[:10])
            assert len(exact & set(got["vec_id"])) / 10 >= 0.9, qid
            assert got.iloc[0]["vec_id"] == qid
        # parallelism-invariance: 1 block vs many blocks, same centroids
        ds1 = rd.read_parquet(emb, columns=["embedding"]).repartition(1)
        ds8 = rd.read_parquet(emb, columns=["embedding"]).repartition(8)
        c1 = sim.train_centroids_distributed(ds1, 8, iters=3)
        c8 = sim.train_centroids_distributed(ds8, 8, iters=3)
        assert np.allclose(c1, c8)

    def test_query_reads_only_probed_partitions(self, ray_session, tmp_path):
        emb = str(tmp_path / "emb.parquet")
        _write_embeddings(emb)
        index_dir = str(tmp_path / "ivf")
        cent = sim.build_ivf_index(emb, index_dir, n_clusters=8)
        q = cent[0]
        ds = sim.query_ivf_index(index_dir, q, k=5, nprobe=2)
        # the input files of the plan cover at most 2 partitions
        files = ds.input_files()
        parts = {f.split("cluster_id=")[1].split("/")[0] for f in files}
        assert len(parts) <= 2


class TestMultimodal:
    def test_synth_image_roundtrip(self):
        b = mm.synth_image_bytes(123, 4567)
        assert b[:4] == mm.QIMG_MAGIC
        w, h, c = struct.unpack_from("<HHB", b, 4)
        assert (w, h, c) == (16 + 123 % 49, 16 + 4567 % 33, 3)
        assert len(b) == 9 + w * h * c

    def test_decode_rejects_unknown_format(self):
        stage = mm.ImageDecodeStage()
        with pytest.raises((NotImplementedError, ValueError)):
            stage._decode_one(b"\x89PNG\r\n\x1a\n garbage")

    def test_decode_pipeline(self, ray_session, tmp_path):
        import ray.data as rd

        media = str(tmp_path / "media.parquet")
        mm.synth_media_for_documents(
            "/root/testdata/sf0.001/documents.parquet", media
        )
        ds = rd.read_parquet(media).filter(expr="media_type == 'image'")
        out = mm.decode_images(ds, batch_size=64).to_pandas()
        assert len(out) == 500
        assert set(out.columns) >= {"media_id", "width", "height", "channels", "n_bytes"}
        # features match the oracle formulas from the source table
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        odf = con.sql(mm.sql_image_features()).df().sort_values("media_id")
        ours = out.sort_values("media_id").reset_index(drop=True)
        for col in ("width", "height", "channels", "n_bytes"):
            assert (ours[col].values == odf[col].values).all(), col

    def test_frame_sample(self, ray_session, tmp_path):
        import ray.data as rd

        media = str(tmp_path / "media.parquet")
        mm.synth_media_for_documents(
            "/root/testdata/sf0.001/documents.parquet", media
        )
        ds = rd.read_parquet(media).filter(expr="media_type == 'video'")
        out = mm.sample_frames(ds, step=5).to_pandas()
        # doc 0: n_frames = 10 -> frames 0, 5
        assert sorted(out[out.media_id == 0]["frame_idx"]) == [0, 5]
        # every frame index is a multiple of step and within bounds
        assert (out["frame_idx"] % 5 == 0).all()

    def test_resize_plan(self):
        batch = pa.Table.from_pydict(
            {"width": pa.array([64, 10]), "height": pa.array([16, 40])}
        )
        out = mm.ResizePlanStage(max_side=32)(batch)
        assert out.column("out_width").to_pylist() == [32, 8]
        assert out.column("out_height").to_pylist() == [8, 32]


class TestAudioSegments:
    def _run(self, samples, threshold=96):
        import struct

        import numpy as np
        import pyarrow as pa

        from quickner_ray.stages.multimodal import QAUD_MAGIC, AudioSegmentStage

        s = np.asarray(samples, dtype="<i2")
        payload = QAUD_MAGIC + struct.pack("<II", 8000, len(s)) + s.tobytes()
        batch = pa.table(
            {"media_id": pa.array([1], type=pa.int64()), "payload": pa.array([payload], type=pa.binary())}
        )
        out = AudioSegmentStage(threshold=threshold)(batch)
        r = out.to_pylist()[0]
        return r["n_loud"], r["n_segments"], r["longest_run"]

    def test_runs(self):
        # quiet, loud x2, quiet, loud x3 -> 2 segments, longest 3
        assert self._run([0, 100, -120, 5, 97, 98, 99]) == (5, 2, 3)

    def test_all_quiet(self):
        assert self._run([0, 1, -5]) == (0, 0, 0)

    def test_all_loud(self):
        assert self._run([127, -128, 100]) == (3, 1, 3)

    def test_empty(self):
        assert self._run([]) == (0, 0, 0)


def test_media_embed_stage_pooling():
    """Pooled embedding equals the brute-force per-pixel bucket sum and the
    stage raises honestly on non-QIMG payloads."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from quickner_ray.stages.multimodal import (
        EMBED_DIM,
        MediaEmbedStage,
        synth_image_bytes,
    )

    b = synth_image_bytes(7, 123)
    stage = MediaEmbedStage()
    out = stage(pa.table({"media_id": [7], "payload": [b]}))
    assert out.num_rows == EMBED_DIM
    px = np.frombuffer(b, dtype=np.uint8, offset=9).astype(int)
    ref = [int(px[j::EMBED_DIM].sum()) for j in range(EMBED_DIM)]
    assert out.column("value").to_pylist() == ref
    assert out.column("dim").to_pylist() == list(range(EMBED_DIM))
    with _pytest.raises(NotImplementedError):
        stage._embed_one(b"JPEG not really")


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingInt8:
    def test_quantization_semantics(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from quickner_ray.pipelines.queries import q_embedding_int8

        # direct kernel probe via a tiny synthetic embeddings dir
        import os
        import tempfile

        import pyarrow.parquet as pq

        vecs = [
            [0.5, -1.0, 0.25, 0.0],   # absmax 1.0 -> -1.0 maps to -127
            [0.0, 0.0, 0.0, 0.0],     # zero vector -> all zeros
            [2.0, 1.0, -0.5, 0.1],    # absmax 2.0 -> 2.0 maps to 127
        ]
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array([0, 1, 2], pa.int64()),
                        "embedding": pa.array(vecs, pa.list_(pa.float32())),
                    }
                ),
                os.path.join(d, "embeddings.parquet"),
            )
            rows = q_embedding_int8(d).take_all()
        got = {(r["vec_id"], r["dim"]): r["q8"] for r in rows}
        assert got[(0, 2)] == -127 and got[(2, 1)] == 127
        assert all(got[(1, j)] == 0 for j in range(1, 5))
        assert all(-127 <= v <= 127 for v in got.values())
        # round-half-away: 0.5/1.0 * 127 = 63.5 -> 64
        assert got[(0, 1)] == 64


class TestRealCodecs:
    """Real-codec decode paths (guarded imports). These run only when the
    codec library is present in the environment; the Q* synthetic-format
    coverage above runs everywhere."""

    def test_pil_image_decode_and_embed(self):
        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        import numpy as np

        im = PIL_Image.new("RGB", (10, 6))
        im.putdata([(i % 256, (i * 3) % 256, (i * 7) % 256) for i in range(60)])
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        png = buf.getvalue()

        stage = mm.ImageDecodeStage()
        assert stage._decode_one(png) == (10, 6, 3)

        embed = mm.MediaEmbedStage()
        px = np.asarray(im, dtype=np.uint8).reshape(-1).astype(np.int64)
        want = np.bincount(
            np.arange(len(px)) % mm.EMBED_DIM, weights=px, minlength=mm.EMBED_DIM
        ).astype(np.int64)
        assert (embed._embed_one(png) == want).all()

    def test_soundfile_audio_decode(self):
        sf = pytest.importorskip("soundfile")
        import io

        import numpy as np

        samples = (np.arange(100, dtype=np.int64) * 37 % 256 - 128).astype(
            np.int16
        )
        buf = io.BytesIO()
        sf.write(buf, samples, 8000, format="WAV", subtype="PCM_16")
        rate, n, s = mm._decode_audio_payload(buf.getvalue(), sf)
        assert (rate, n) == (8000, 100)
        assert (s == samples.astype(np.int64)).all()

    def test_pyav_frame_count(self):
        av = pytest.importorskip("av")
        import io

        import numpy as np

        buf = io.BytesIO()
        with av.open(buf, mode="w", format="mp4") as container:
            stream = container.add_stream("mpeg4", rate=5)
            stream.width, stream.height = 32, 32
            stream.pix_fmt = "yuv420p"
            for i in range(7):
                frame = av.VideoFrame.from_ndarray(
                    np.full((32, 32, 3), i * 30, dtype=np.uint8), format="rgb24"
                )
                for packet in stream.encode(frame):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
        stage = mm.FrameSampleStage(step=2)
        assert stage._n_frames(buf.getvalue()) == 7

    def test_stub_only_without_codecs(self):
        """When no codec is importable, non-Q* payloads raise the documented
        NotImplementedError (the only reachable stub)."""
        stage = mm.ImageDecodeStage()
        if stage._pil_image is not None:
            pytest.skip("PIL present: real path active")
        with pytest.raises(NotImplementedError):
            stage._decode_one(b"\x89PNG\r\n\x1a\nxxxx")
