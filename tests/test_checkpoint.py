"""Streaming prediction checkpoint: flush, resume, crash tolerance."""

import numpy as np

from metagenomic_deepfri_tpu.checkpoint import PredictionCheckpoint


def _scores(seed, n=4):
    return np.random.default_rng(seed).random(n).astype(np.float32)


class TestPredictionCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        ckpt = PredictionCheckpoint(tmp_path / "ck")
        ckpt.add("gcn", {"mf": {"q1": _scores(1), "q2": _scores(2)},
                         "bp": {"q1": _scores(3)}})
        ckpt.add("gcn", {"bp": {"q2": _scores(4)}})
        ckpt.add("cnn", {"mf": {"q3": _scores(5)}})

        # new instance = process restart
        resumed = PredictionCheckpoint(tmp_path / "ck")
        assert resumed.completed("gcn", ["mf", "bp"]) == {"q1", "q2"}
        assert resumed.completed("cnn", ["mf"]) == {"q3"}
        # q3 lacks bp → not complete for both modes
        assert resumed.completed("cnn", ["mf", "bp"]) == set()
        np.testing.assert_array_equal(resumed.scores("gcn")["mf"]["q2"],
                                      _scores(2))

    def test_merge_into_engine_results(self, tmp_path):
        ckpt = PredictionCheckpoint(tmp_path / "ck")
        ckpt.add("gcn", {"mf": {"old": _scores(1)}})
        out = {"mf": {"new": _scores(2)}}
        ckpt.merge_into("gcn", out)
        assert set(out["mf"]) == {"old", "new"}

    def test_truncated_part_is_skipped(self, tmp_path):
        ckpt = PredictionCheckpoint(tmp_path / "ck")
        ckpt.add("gcn", {"mf": {"q1": _scores(1)}})
        # simulate a crash mid-write of the next part
        (tmp_path / "ck" / "part-0001.npz").write_bytes(b"PK\x03\x04trunc")
        resumed = PredictionCheckpoint(tmp_path / "ck")
        assert resumed.completed("gcn", ["mf"]) == {"q1"}

    def test_remove(self, tmp_path):
        ckpt = PredictionCheckpoint(tmp_path / "ck")
        ckpt.add("gcn", {"mf": {"q1": _scores(1)}})
        ckpt.remove()
        assert not (tmp_path / "ck").exists()

    def test_empty_add_writes_nothing(self, tmp_path):
        ckpt = PredictionCheckpoint(tmp_path / "ck")
        ckpt.add("gcn", {"mf": {}})
        assert list((tmp_path / "ck").glob("part-*.npz")) == []

    def test_overflow_marks_survive_crash(self, tmp_path):
        # streamed (truncated) scores checkpointed + overflow marked, then
        # crash before the dense re-run: the resumed instance must still
        # report the qids as pending overflow even though their modes are
        # "completed".
        ckpt = PredictionCheckpoint(tmp_path / "ck")
        ckpt.add("gcn", {"mf": {"q1": _scores(1), "q2": _scores(2)}})
        ckpt.mark_overflow("gcn", "mf", ["q1"])

        resumed = PredictionCheckpoint(tmp_path / "ck")
        assert resumed.completed("gcn", ["mf"]) == {"q1", "q2"}
        assert resumed.overflow("gcn") == {"mf": {"q1"}}

        # dense re-run writes corrected scores and strikes the mark out
        resumed.add("gcn", {"mf": {"q1": _scores(9)}})
        resumed.resolve_overflow("gcn", "mf", ["q1"])
        assert resumed.overflow("gcn") == {}

        again = PredictionCheckpoint(tmp_path / "ck")
        assert again.overflow("gcn") == {}
        np.testing.assert_array_equal(again.scores("gcn")["mf"]["q1"],
                                      _scores(9))

    def test_overflow_log_truncated_line_tolerated(self, tmp_path):
        ckpt = PredictionCheckpoint(tmp_path / "ck")
        ckpt.mark_overflow("cnn", "bp", ["qa", "qb"])
        with open(tmp_path / "ck" / "overflow.log", "a",
                  encoding="utf-8") as f:
            f.write("OVER|cnn")  # crash mid-line
        resumed = PredictionCheckpoint(tmp_path / "ck")
        assert resumed.overflow("cnn") == {"bp": {"qa", "qb"}}
