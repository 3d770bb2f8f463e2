"""CLI-surface helpers of the experiment drivers.

The eval sweep flags resolve to KEY_FRAME_OFFSET values; the tables
report ANNOTATED offsets (interval-1-key). Getting this mapping wrong
mis-aimed sweeps in three separate sessions (BASELINE.md extreme finding
6, the first r4 battery launch), so it is pinned here.
"""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "experiments_test_driver",
    os.path.join(os.path.dirname(__file__), "..", "experiments", "test.py"),
)
_driver = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_driver)
resolve_key_offsets = _driver.resolve_key_offsets


def test_ann_offsets_convert_to_key_offsets():
    # annotated offset 4 at k=5 = key offset 0: the keyframe sits 4
    # frames before the annotated frame, the farthest warped row
    assert resolve_key_offsets(5, ann_offsets="3,4") == [1, 0]
    assert resolve_key_offsets(10, ann_offsets="8") == [1]
    assert resolve_key_offsets(5, ann_offsets="0") == [4]


def test_key_offsets_pass_through():
    assert resolve_key_offsets(5, offsets="0,1") == [0, 1]


def test_ann_offsets_win_over_offsets():
    assert resolve_key_offsets(5, ann_offsets="4", offsets="4") == [0]


def test_sweep_covers_every_offset_once():
    keys = resolve_key_offsets(5, offset_sweep=True)
    assert sorted(5 - 1 - k for k in keys) == [0, 1, 2, 3, 4]


def test_default_is_cfg_key_offset():
    assert resolve_key_offsets(5, default_key_offset=2) == [2]
