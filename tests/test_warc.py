"""WARC datasource: synthetic crawl round-trips byte-identically."""

from __future__ import annotations

import pytest


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip"])
def test_warc_roundtrip(tmp_path, gz):
    import pyarrow.parquet as pq

    from quickner_ray.kernel.htmlextract import extract_text
    from quickner_ray.sources.warc import read_warc, write_synth_warc

    src = "/root/testdata/sf0.001/documents.parquet"
    files = write_synth_warc(str(tmp_path), src, repeat=2, gzip_files=gz)
    assert len(files) == 2
    ds = read_warc(files)
    rows = ds.take_all()
    tab = pq.read_table(src, columns=["text", "lang"])
    texts, langs = tab.column("text").to_pylist(), tab.column("lang").to_pylist()
    assert len(rows) == 2 * len(texts)
    by_url = {r["url"]: r for r in rows}
    assert len(by_url) == len(rows)  # distinct urls across repeats
    # per-url byte-identical extraction + lang carried through WARC headers
    for i, (t, lg) in enumerate(zip(texts, langs)):
        r = by_url[f"https://example.org/crawl/{i:012d}"]
        assert extract_text(r["html"]) == t
        assert r["lang"] == lg
        assert r["warc_ts"] is not None


@pytest.mark.usefixtures("ray_session")
def test_warc_feeds_kg_prep(tmp_path):
    """read_warc -> extract -> detect chain produces the same mention
    stream as the parquet pages path."""
    from quickner_ray.pipelines.kg import KGPipelineConfig, annotate_dataset
    from quickner_ray.pipelines.queries import documents_gazetteer
    from quickner_ray.sources.warc import read_warc, write_synth_warc

    src = "/root/testdata/sf0.001/documents.parquet"
    files = write_synth_warc(str(tmp_path), src)
    cfg = KGPipelineConfig(source="html", batch_size=256)
    ann = annotate_dataset(read_warc(files), documents_gazetteer(), cfg)
    n_mentions = sum(len(r["label"]) for r in ann.take_all())
    assert n_mentions > 0


@pytest.mark.usefixtures("ray_session")
def test_run_kg_over_warc_input(tmp_path):
    """Full run_kg accepts a WARC crawl directory: same triples as the
    parquet-pages path over the same corpus."""
    import ray.data as rd

    from quickner_ray.pipelines.kg import KGPipelineConfig, run_kg
    from quickner_ray.pipelines.queries import documents_gazetteer
    from quickner_ray.sources.pages import write_synth_pages
    from quickner_ray.sources.warc import write_synth_warc

    src = "/root/testdata/sf0.001/documents.parquet"
    warc_dir, pq_dir = tmp_path / "warc", tmp_path / "pages"
    write_synth_warc(str(warc_dir), src)
    write_synth_pages(str(pq_dir), src)
    gaz = documents_gazetteer()
    cfg = KGPipelineConfig(source="html", batch_size=256, shard_parallelism=1)
    run_kg(str(warc_dir), gaz, str(tmp_path / "out_w"), cfg)
    run_kg(str(pq_dir), gaz, str(tmp_path / "out_p"), cfg)
    tw = rd.read_parquet(str(tmp_path / "out_w" / "triples")).take_all()
    tp = rd.read_parquet(str(tmp_path / "out_p" / "triples")).take_all()
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["start"], r["end"])
    assert sorted(map(key, tw)) == sorted(map(key, tp))
    assert len(tw) > 0


def test_warc_parser_binary_safe():
    """Content-Length framing must survive bodies containing header-like
    bytes, blank lines, and CRLFs — no resynchronization on content."""
    import datetime as dt
    import io

    from quickner_ray.sources.warc import _parse_warc_stream, _record

    nasty = b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nbody-impostor\x00\xff"
    ts = dt.datetime(2023, 5, 1)
    buf = (
        _record("https://a/1", ts, nasty, "en")
        + _record("https://a/2", ts, b"", "fr")       # empty body
        + _record("https://a/3", ts, b"plain", "")
    )
    recs = list(_parse_warc_stream(io.BufferedReader(io.BytesIO(buf))))
    assert [(r[0], r[2], r[3]) for r in recs] == [
        ("https://a/1", nasty, "en"),
        ("https://a/2", b"", "fr"),
        ("https://a/3", b"plain", ""),
    ]
    assert all(r[1] == ts for r in recs)


def test_warc_skips_non_response_records():
    import datetime as dt
    import io

    from quickner_ray.sources.warc import _parse_warc_stream

    ts = dt.datetime(2023, 5, 1).strftime("%Y-%m-%dT%H:%M:%SZ")
    req = (
        f"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x\r\n"
        f"WARC-Date: {ts}\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
    ).encode()
    resp = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://y\r\n"
        f"WARC-Date: {ts}\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    ).encode()
    recs = list(_parse_warc_stream(io.BufferedReader(io.BytesIO(req + resp))))
    assert [(r[0], r[2]) for r in recs] == [("https://y", b"ok")]


@pytest.mark.usefixtures("ray_session")
def test_wet_roundtrip_feeds_text_path(tmp_path):
    """WET conversion records carry extracted TEXT; feeding the kg text
    path yields the same mention stream as parquet text input."""
    import pyarrow.parquet as pq

    from quickner_ray.sources.warc import read_wet, write_synth_wet

    src = "/root/testdata/sf0.001/documents.parquet"
    files = write_synth_wet(str(tmp_path), src, gzip_files=True)
    rows = read_wet(files).take_all()
    texts = pq.read_table(src, columns=["text"]).column("text").to_pylist()
    assert len(rows) == len(texts)
    by_url = {r["url"]: r["text"] for r in rows}
    for i, t in enumerate(texts):
        assert by_url[f"https://example.org/crawl/{i:012d}"] == t
