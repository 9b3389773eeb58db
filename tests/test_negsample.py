"""Deterministic KG negative sampling vs a brute-force reference."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from quickner_ray.stages.negsample import negative_samples


def _ref(pairs, vocab, k):
    """Brute-force mirror: md5-picked tails, accidental positives dropped."""
    from quickner_ray.kernel.md5vec import md5_h64

    vocab = sorted(vocab)
    pos = set(pairs)
    out = set()
    for s, d in pairs:
        for i in range(k):
            h = int(md5_h64(pa.array([f"{s}|{d}|{i}"]))[0])
            dn = vocab[h % len(vocab)]
            if (s, dn) not in pos:
                out.add((s, dn, i))
    return out


def _run(pairs, k, vocab=None, parallelism=1):
    t = pa.table(
        {
            "src": pa.array([s for s, _ in pairs]),
            "dst": pa.array([d for _, d in pairs]),
        }
    )
    ds = rd.from_arrow(t)
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    vds = (
        rd.from_arrow(pa.table({"e": pa.array(sorted(vocab))}))
        if vocab is not None
        else None
    )
    out = negative_samples(ds, vocab=vds, k=k).take_all()
    return {(r["src"], r["dst_neg"], r["sample_i"]) for r in out}


PAIRS = [(f"s{i % 4}", f"t{(i * 3) % 11}") for i in range(20)]
PAIRS = sorted(set(PAIRS))
VOCAB = [f"t{j}" for j in range(11)] + [f"x{j}" for j in range(9)]


@pytest.mark.usefixtures("ray_session")
class TestNegativeSamples:
    def test_matches_reference_default_vocab(self):
        tails = sorted({d for _, d in PAIRS})
        assert _run(PAIRS, k=3) == _ref(PAIRS, tails, 3)

    def test_matches_reference_custom_vocab(self):
        assert _run(PAIRS, k=3, vocab=VOCAB) == _ref(PAIRS, VOCAB, 3)

    def test_no_accidental_positives(self):
        got = _run(PAIRS, k=5, vocab=VOCAB)
        pos = set(PAIRS)
        assert got and all((s, d) not in pos for s, d, _ in got)

    def test_parallelism_invariant(self):
        assert _run(PAIRS, k=3, vocab=VOCAB, parallelism=7) == _ref(
            PAIRS, VOCAB, 3
        )

    def test_k_bounds_output(self):
        got = _run(PAIRS, k=2, vocab=VOCAB)
        assert len(got) <= 2 * len(PAIRS)
        assert {i for _, _, i in got} <= {0, 1}

    def test_k_validation(self):
        with pytest.raises(ValueError, match="k >= 1"):
            negative_samples(
                rd.from_arrow(pa.table({"src": ["a"], "dst": ["b"]})), k=0
            )
