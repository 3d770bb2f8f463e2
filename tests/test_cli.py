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


def test_out_of_range_offsets_raise():
    # an ann offset valid at k=10 reused at k=5 resolves to a NEGATIVE key
    # offset — previously it silently measured a different protocol
    # (advisor r4: the exact mis-aimed-sweep class this helper prevents)
    import pytest

    with pytest.raises(ValueError, match="outside"):
        resolve_key_offsets(5, ann_offsets="8")
    with pytest.raises(ValueError, match="outside"):
        resolve_key_offsets(5, offsets="5")
    with pytest.raises(ValueError, match="outside"):
        resolve_key_offsets(5, ann_offsets="-1")


# ---------------------------------------------------------------------------
# Checkpoint provenance / eval-mode guardrail (VERDICT r4 #4): the repo's
# own tables prove eval-mode mismatch is the largest accuracy hazard in the
# system (31.97 vs 84.36 for clip-through-direct under incremental;
# 20.2 for pair; ~25 points for cascade-semantics mismatch at k=10).


def _prov(objective="clip", propagate="direct", cascade="product",
          norm="mean1"):
    return {
        "objective": objective,
        "propagate": propagate,
        "scale_cascade": cascade,
        "scale_field_norm": norm,
        "family": "accel",
    }


def _net(cascade="product", norm="mean1"):
    return {"scale_cascade": cascade, "scale_field_norm": norm}


def test_clip_direct_under_incremental_raises():
    from accel_tpu.core.checkpoint import (
        EvalSemanticsError,
        check_eval_semantics,
    )
    import pytest

    with pytest.raises(EvalSemanticsError, match="31.97"):
        check_eval_semantics(_prov("clip", "direct"), "incremental", _net())
    # --force downgrades to a loud warning
    warns = check_eval_semantics(
        _prov("clip", "direct"), "incremental", _net(), force=True
    )
    assert any("FORCED" in w for w in warns)


def test_pair_under_cascading_eval_raises():
    from accel_tpu.core.checkpoint import (
        EvalSemanticsError,
        check_eval_semantics,
    )
    import pytest

    for mode in ("incremental", "composed"):
        with pytest.raises(EvalSemanticsError, match="pair"):
            check_eval_semantics(_prov("pair", "direct"), mode, _net())


def test_matched_semantics_are_silent():
    from accel_tpu.core.checkpoint import check_eval_semantics

    assert check_eval_semantics(_prov("clip", "direct"), "direct", _net()) == []
    assert check_eval_semantics(
        _prov("clip", "incremental"), "incremental", _net()
    ) == []
    # no provenance (pre-r5 checkpoint) -> no checks
    assert check_eval_semantics(None, "incremental", _net()) == []


def test_benign_interventions_warn_not_raise():
    from accel_tpu.core.checkpoint import check_eval_semantics

    # incremental-trained ckpt under direct eval: measured fine (80.79 vs
    # 80.33) — warn only
    warns = check_eval_semantics(
        _prov("clip", "incremental"), "direct", _net()
    )
    assert len(warns) == 1 and "differs" in warns[0]
    # eval-time cascade intervention ('last' on a product-trained ckpt)
    warns = check_eval_semantics(
        _prov("clip", "incremental", cascade="product"), "incremental",
        _net(cascade="last"),
    )
    assert any("scale_cascade" in w for w in warns)


def test_provenance_roundtrip(tmp_path):
    from accel_tpu.core.checkpoint import load_provenance, save_provenance

    d = str(tmp_path / "prefix")
    assert load_provenance(d) is None
    save_provenance(d, _prov())
    assert load_provenance(d) == _prov()


def test_last_trained_under_product_cascade_raises():
    """A 'last'-trained checkpoint served with the 'product' cascade
    re-introduces the compounding the model never trained through (the
    r4 advisor's streaming-server trap class) — fatal unless forced."""
    from accel_tpu.core.checkpoint import (
        EvalSemanticsError,
        check_eval_semantics,
    )
    import pytest

    with pytest.raises(EvalSemanticsError, match="product"):
        check_eval_semantics(
            _prov("clip", "incremental", cascade="last"), "incremental",
            _net(cascade="product"),
        )
    # native 'last' serving point of the same checkpoint: silent
    assert check_eval_semantics(
        _prov("clip", "incremental", cascade="last"), "incremental",
        _net(cascade="last"),
    ) == []


def test_cascade_mismatch_silent_under_direct_eval():
    """Cascade semantics are vacuous under direct eval (single warp) —
    no misleading warning (review r5)."""
    from accel_tpu.core.checkpoint import check_eval_semantics

    warns = check_eval_semantics(
        _prov("clip", "incremental", cascade="product"), "direct",
        _net(cascade="last"),
    )
    assert not any("scale_cascade" in w for w in warns)


def test_product_to_last_warning_is_not_a_hazard_note():
    """The shipped incremental serving point (product-trained, 'last'
    eval — the measured-best direction) warns as an intentional
    intervention, not as a collapse hazard (review r5)."""
    from accel_tpu.core.checkpoint import check_eval_semantics

    warns = check_eval_semantics(
        _prov("clip", "incremental", cascade="product"), "incremental",
        _net(cascade="last"),
    )
    assert any("measured-BEST" in w for w in warns)
    assert not any("collapse" in w.lower() for w in warns)


def test_default_key_offset_range_checked():
    import pytest

    with pytest.raises(ValueError, match="KEY_FRAME_OFFSET"):
        resolve_key_offsets(3, default_key_offset=4)
    assert resolve_key_offsets(5, default_key_offset=4) == [4]
