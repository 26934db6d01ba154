"""CTC sequence DB: bundled table matches the reference's, helpers agree."""
import os

import numpy as np

from pmp_vvc_tpu.data.sequences import (
    CTC_SEQUENCES, get_sequence, load_sequence_table, sequences_by_class,
)

REF_TABLE = "/root/reference/VVC_Test_Sequences.txt"


def test_bundled_matches_reference_table():
    if not os.path.exists(REF_TABLE):
        import pytest
        pytest.skip("reference table not mounted")
    ref = load_sequence_table(REF_TABLE)
    assert len(ref) == len(CTC_SEQUENCES) == 26
    for a, b in zip(ref, CTC_SEQUENCES):
        assert (a.name, a.filename, a.width, a.height, a.frames, a.fps) == \
            (b.name, b.filename, b.width, b.height, b.frames, b.fps)


def test_block_count_matches_reference_formula():
    # Metrics.py:723-727 with SubSampleRatio=30
    for s in CTC_SEQUENCES:
        sub = (s.frames + 29) // 30
        assert s.sub_frame_count(30) == sub
        assert s.block_count(30) == (s.width // 64) * (s.height // 64) * sub


def test_lookup_and_classes():
    t = get_sequence("Tango2")
    assert t.is10bit and t.ctc_class == "A1" and t.width == 3840
    assert not get_sequence("Cactus").is10bit
    assert {s.ctc_class for s in CTC_SEQUENCES} == \
        {"A1", "A2", "B", "C", "D", "E", "F"}
    assert [s.name for s in sequences_by_class("D")] == \
        ["BasketballPass", "BQSquare", "BlowingBubbles", "RaceHorses"]
