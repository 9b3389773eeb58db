"""BPE merge learning: hand-derived merges, determinism across layouts,
weighting by term frequency."""

from __future__ import annotations

import pyarrow as pa
import pytest

from quickner_ray.stages.bpe import learn_merges


class TestLearnMerges:
    def test_hand_derived(self):
        # "abab" x3, "ab" x2 -> pair (a,b) count 3*2+2*1=8 wins first.
        # After merging: ["ab","ab"] x3, ["ab"] x2 -> (ab,ab) count 3.
        merges = learn_merges([("abab", 3), ("ab", 2)], n_merges=3)
        assert merges[0] == ("a", "b", 8)
        assert merges[1] == ("ab", "ab", 3)
        assert len(merges) == 2  # nothing left to merge

    def test_tie_breaks_lexicographic(self):
        # pairs (a,b) and (c,d) both count 1 -> (a,b) first
        merges = learn_merges([("ab", 1), ("cd", 1)], n_merges=1)
        assert merges[0] == ("a", "b", 1)

    def test_weight_beats_length(self):
        # rare long word vs frequent short word: frequency dominates
        merges = learn_merges([("xy", 10), ("zzzz", 1)], n_merges=1)
        assert merges[0] == ("x", "y", 10)


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_deterministic_across_layouts():
    import ray.data as rd

    from quickner_ray.stages.bpe import bpe_train

    texts = ["the cat sat", "the cat", "a hat the cat wore", "sat sat the"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    a = bpe_train(rd.from_arrow(tbl), n_merges=8).to_pandas()
    b = bpe_train(rd.from_arrow(tbl).repartition(5), n_merges=8).to_pandas()
    assert a.equals(b)
    # "th"+"e" or "at" family dominates this corpus; first merge count must
    # equal the corpus-wide pair weight, here ('a','t') in cat/sat/hat = 7
    # vs ('t','h') in 'the' x4 -> at wins with 7
    assert a.iloc[0][["left", "right"]].tolist() == ["a", "t"]
    assert a.iloc[0]["pair_count"] == 7
